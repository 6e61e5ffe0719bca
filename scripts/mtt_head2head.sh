#!/bin/bash
# Turn-key MTT trained-case head-to-head (VERDICT r3 ask #3).
#
# Round-4 root cause (PARITY_MTT10.md): every earlier MTT head-to-head
# used a degenerate expert buffer — the reference's buffer.py snapshots
# alias on CPU — so both sides divided by param_dist=0. The harness now
# patches .clone() in; with a fixed buffer the reference LEARNS on the
# fixture at lr_img=100. This script produces the trained-case table:
#
#   phase A (torch CPU): train fresh experts + run the reference MTT
#   phase B (TPU):       run the rebuild MTT on the SAME buffer/fixture
#
# Phase A is CPU-bound (hours); phase B needs the axon tunnel. Run them
# back-to-back, never concurrently with TPU timing work (1-core host).
set -u
cd "$(dirname "$0")/.."
BUF=/tmp/parity_buf_fix
OUT=/tmp/parity_mtt
mkdir -p $OUT

# --mtt_init noise: real init saturates the separable fixture at it=0
# (no headroom to demonstrate learning); noise starts both sides at
# chance so the table shows rising accuracy bands.
echo "=== phase A: reference side (torch CPU, fixed buffer) ==="
timeout 28800 python scripts/parity_head2head.py --cpu --mtt_only --mtt \
    --side ref --mtt_lr_img 100 --mtt_init noise --buffer_dir $BUF \
    --json $OUT/ref.json 2>&1 | tee $OUT/ref.log | grep -E "===|it=|acc|loss" | tail -40

echo "=== phase B: rebuild side (TPU, shared buffer) ==="
timeout 14400 python scripts/parity_head2head.py --mtt_only --mtt \
    --side rebuild --mtt_lr_img 100 --mtt_init noise --buffer_dir $BUF \
    --json $OUT/rebuild.json 2>&1 | tee $OUT/rebuild.log | grep -E "===|it=|acc|loss" | tail -40

echo "=== head-to-head done; tables in $OUT/{ref,rebuild}.json ==="
