#!/bin/bash
# Turn-key TPU measurement campaign for round 4 (run when the axon
# tunnel is back). Order matters: the post-fix bench headline first
# (VERDICT ask #1), then the Pallas kernel A/B, then the bf16-HVP cost
# A/B + locate (ask #2). Each stage appends to /tmp/tpu_campaign/.
set -u
OUT=/tmp/tpu_campaign
mkdir -p $OUT
cd "$(dirname "$0")/.."

echo "=== stage 0: tunnel check ==="
timeout 1800 python -c "
from video_distillation_tpu.parallel.mesh import ensure_platform_env
ensure_platform_env()
import jax
print('devices:', jax.devices())
print('ok', float(jax.numpy.ones((8,8)).sum()))
" 2>&1 | tail -2 | tee $OUT/probe.log
grep -q "ok 64" $OUT/probe.log || { echo "TUNNEL STILL DOWN"; exit 1; }

echo "=== stage 1: bench.py (post-fix headline) ==="
timeout 3600 python bench.py 2>&1 | tee $OUT/bench_baseline.log

echo "=== stage 2: kernel A/B (full-graph, fresh subprocess per combo) ==="
timeout 7200 python scripts/ab_kernels.py --iters 10 2>&1 | tee $OUT/ab_kernels.log

echo "=== stage 3: bf16-HVP cost A/B ==="
timeout 3600 python scripts/bisect_bf16_hvp.py --mode ab --steps 3 2>&1 | tee $OUT/hvp_ab.log

echo "=== stage 4: bf16-HVP locate (jax_debug_nans) ==="
timeout 3600 python scripts/bisect_bf16_hvp.py --mode locate --hvp_dtype bfloat16 2>&1 | tail -80 | tee $OUT/hvp_locate.log

echo "=== campaign done; results in $OUT ==="
