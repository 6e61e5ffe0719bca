"""Full-graph A/B of XLA compiler options on the flagship S2D-MTT step.

BASELINE.md r5 attributes the 1.227 -> 1.7 steps/s gap to
second-order scheduling context inside the reverse-over-forward
backward ("not reachable by op-level surgery"). That claim is only
honest if the compiler's own scheduling knobs have been tried: this
harness A/Bs XLA compile options that change scheduling/fusion
behavior without touching the graph.

XLA_FLAGS in the client env does NOT reliably reach the remote (axon)
compiler; per-executable `compiler_options` ride the compile request's
env_option_overrides, so each combo monkeypatches jax.jit to inject
them before the model modules import (mtt.py calls jax.jit directly).

Each combo runs bench.bench_s2d_mtt — the real outer step at the
miniUCF101 ipc=1 shape — in a fresh subprocess (full recompile each).

Usage (on the TPU): python scripts/ab_xla_sched.py [--iters 10] [--only a,b]
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
    # latency-hiding scheduler: reorders ops to overlap DMA with compute;
    # mostly built for async collectives but also moves HBM prefetch.
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    # scoped VMEM ceiling: default ~16 MiB/core caps fusion sizes; the
    # where-chain loop fusions + remat prologues here are VMEM-hungry.
    ("vmem32", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem128", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
    ("lhs+vmem64", {"xla_tpu_enable_latency_hiding_scheduler": "true",
                    "xla_tpu_scoped_vmem_limit_kib": "65536"}),
    # global exec-time effort knob (XLA's own "try harder" dial) —
    # measured: this libtpu's option parser predates the flag
    # ("No such compile option"), kept for newer toolchains.
    ("effort", {"xla_exec_time_optimization_effort": "1.0"}),
]

CHILD = r"""
import sys, json
sys.path.insert(0, {repo!r})
import jax
_opts = {opts!r}
if _opts:
    _orig_jit = jax.jit
    def _jit(*a, **k):
        k.setdefault("compiler_options", _opts)
        return _orig_jit(*a, **k)
    jax.jit = _jit
import bench
rate = bench.bench_s2d_mtt(warmup=2, iters={iters})
print("RATE_JSON " + json.dumps({{"steps_per_sec": rate}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default=None,
                    help="comma-separated combo names to run")
    args = ap.parse_args()
    names = set(args.only.split(",")) if args.only else None

    results = {}
    for name, opts in COMBOS:
        if names is not None and name not in names:
            continue
        code = CHILD.format(repo=REPO, opts=opts, iters=args.iters)
        print(f"=== {name}: {opts or '(no overrides)'}", flush=True)
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, cwd=REPO)
        rate = None
        for line in proc.stdout.splitlines():
            if line.startswith("RATE_JSON "):
                rate = json.loads(line[len("RATE_JSON "):])["steps_per_sec"]
        if rate is None:
            tail = "\n".join((proc.stderr or proc.stdout).splitlines()[-15:])
            print(f"  FAILED (rc={proc.returncode}):\n{tail}", flush=True)
            results[name] = {"error": proc.returncode}
        else:
            print(f"  {rate:.4f} steps/s", flush=True)
            results[name] = {"steps_per_sec": rate}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
