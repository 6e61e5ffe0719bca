"""Full-graph A/B of the r4 Pallas kernels on the flagship S2D-MTT step.

Only full-graph traces count (r3 lesson: an isolated conv1 probe showed
direct10 2.1x FASTER while the full graph showed it 9% slower), so each
combo runs bench.bench_s2d_mtt — the real outer step at the miniUCF101
ipc=1 shape — in a fresh subprocess (the toggles are read at import).

Usage (on the TPU): python scripts/ab_kernels.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMBOS = [
    ("baseline", {}),
    ("pack", {"VD_PACK_KERNEL": "pallas"}),
    ("phase", {"VD_PHASE_KERNEL": "pallas"}),
    ("pack+phase", {"VD_PACK_KERNEL": "pallas",
                    "VD_PHASE_KERNEL": "pallas"}),
    ("wide_s2d", {"VD_WIDE_CONV": "s2d"}),
    ("phase_dgrad", {"VD_WIDE_DGRAD": "phase"}),
    ("all", {"VD_PACK_KERNEL": "pallas", "VD_PHASE_KERNEL": "pallas",
             "VD_WIDE_CONV": "s2d"}),
]

CHILD = r"""
import sys, json
sys.path.insert(0, {repo!r})
import bench
rate = bench.bench_s2d_mtt(warmup=2, iters={iters})
print("RATE_JSON " + json.dumps({{"steps_per_sec": rate}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default=None,
                    help="comma list of combo names to run")
    args = ap.parse_args()

    results = {}
    for name, env in COMBOS:
        if args.only and name not in args.only.split(","):
            continue
        child_env = dict(os.environ, **env)
        print(f"=== {name} ({env}) ===", flush=True)
        proc = subprocess.run(
            [sys.executable, "-c",
             CHILD.format(repo=REPO, iters=args.iters)],
            env=child_env, capture_output=True, text=True)
        sys.stdout.write(proc.stdout[-2000:])
        sys.stderr.write(proc.stderr[-2000:])
        rate = None
        for line in proc.stdout.splitlines():
            if line.startswith("RATE_JSON "):
                rate = json.loads(line[len("RATE_JSON "):])["steps_per_sec"]
        results[name] = rate
        print(f"--> {name}: {rate}", flush=True)
    print("AB_RESULTS " + json.dumps(results))


if __name__ == "__main__":
    main()
