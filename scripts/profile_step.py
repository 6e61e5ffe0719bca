"""Profile the S2D-MTT outer step on the TPU and print a per-op breakdown.

Usage: python scripts/profile_step.py [--steps 4] [--logdir /tmp/prof]

Parses the jax.profiler trace (the axon device timeline lives under the
TPU pid in trace.json.gz) and aggregates device-op durations by fusion
name, dividing by the number of profiled steps. This is the measurement
loop behind the CLAUDE.md per-op budgets — single-op microbenches are
useless here (relay fetch overhead + XLA DCE), so we always trace the
real graph.
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def run_steps(steps: int, logdir: str, syn_steps: int = 10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_distillation_tpu.distill.mtt import (_build_s2d_mtt_step,
                                                    flat_param_template,
                                                    make_batch_plan)
    from video_distillation_tpu.distill.s2d import S2DConfig, init_s2d_state

    num_classes, frames, im = 50, 16, (112, 112)
    s2d_cfg = S2DConfig(num_classes=num_classes, spc=2, dpc=2, vpc=1,
                        n_hal=1, frames=frames, im_size=im)
    state = init_s2d_state(jax.random.PRNGKey(0), s2d_cfg)
    _, _, flat0, _ = flat_param_template("ConvNet3D", 3, num_classes, im,
                                         frames, seed=0)
    _, _, flat1, _ = flat_param_template("ConvNet3D", 3, num_classes, im,
                                         frames, seed=1)
    s2d_items = tuple(sorted(dataclasses.asdict(s2d_cfg).items()))
    step_fn = _build_s2d_mtt_step(
        "ConvNet3D", 3, num_classes, im, frames, syn_steps=syn_steps,
        s2d_items=s2d_items, lr_static=100.0, lr_dynamic=0.01, lr_hal=0.01,
        lr_lr=1e-5, train_static=False, train_lr=True,
        compute_dtype="bfloat16")

    n_syn = num_classes
    rng = np.random.default_rng(0)
    moms = jax.tree.map(jnp.zeros_like, state)
    syn_lr = jnp.asarray(0.01)
    mom_lr = jnp.zeros(())
    theta0 = jnp.asarray(flat0)
    theta1 = jnp.asarray(flat1)

    def run(i, state, syn_lr, moms, mom_lr):
        plan = jnp.asarray(make_batch_plan(rng, n_syn, n_syn, syn_steps))
        out = step_fn(jax.random.fold_in(jax.random.PRNGKey(1), i), state,
                      syn_lr, moms, mom_lr, theta0, theta1, plan)
        return out[0], out[1], out[2], out[3], out[4]

    for i in range(3):
        state, syn_lr, moms, mom_lr, loss = run(i, state, syn_lr, moms,
                                                mom_lr)
        print(f"warmup {i}: loss={float(loss):.4f}")
    t0 = time.perf_counter()
    jax.profiler.start_trace(logdir)
    for i in range(steps):
        state, syn_lr, moms, mom_lr, loss = run(10 + i, state, syn_lr,
                                                moms, mom_lr)
    final = float(loss)  # host fetch = true sync on axon
    jax.profiler.stop_trace()
    dt = time.perf_counter() - t0
    print(f"{steps} steps in {dt:.3f}s -> {steps / dt:.3f} steps/s "
          f"(loss={final:.4f})")
    return dt


def run_dm_steps(steps: int, logdir: str):
    """DM outer step at the sh/baseline/DM.sh shape (VERDICT r4 ask #5):
    the chunked class-group embed in dm.py — same harness as
    bench.py:bench_dm, wrapped in a jax.profiler trace."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_distillation_tpu.data import make_synthetic_video_data
    from video_distillation_tpu.distill.dm import (DMState,
                                                   init_synthetic_raw,
                                                   make_dm_trainer)

    data = make_synthetic_video_data(num_classes=50, clips_per_class=8,
                                     test_per_class=1, frames=16,
                                     im_size=(112, 112), name="prof-dm")
    rng = np.random.default_rng(0)
    syn, labels = init_synthetic_raw(jax.random.PRNGKey(0), data.train,
                                     1, 16, "real", rng)
    state = DMState(syn, labels, jnp.zeros_like(syn))
    trainer = make_dm_trainer(data.train, "ConvNet3D", 1, 64, 1.0, 16,
                              "bfloat16")
    key = jax.random.PRNGKey(1)
    for i in range(3):
        state, loss = trainer(jax.random.fold_in(key, i), state, rng)
        print(f"warmup {i}: loss={float(loss):.4f}")
    t0 = time.perf_counter()
    jax.profiler.start_trace(logdir)
    for i in range(steps):
        state, loss = trainer(jax.random.fold_in(key, 100 + i), state, rng)
    final = float(loss)
    jax.profiler.stop_trace()
    dt = time.perf_counter() - t0
    print(f"{steps} DM steps in {dt:.3f}s -> {steps / dt:.3f} steps/s "
          f"(loss={final:.4f})")
    return dt


def parse_trace(logdir: str, steps: int, top: int = 40):
    paths = sorted(glob.glob(os.path.join(
        logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print("no trace found under", logdir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # identify the device pid + the leaf "XLA Ops" thread (other threads
    # carry nested module/step spans that would double-count)
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dev_pids = [p for p, name in pid_names.items()
                if "TPU" in name or "/device" in name.lower()]
    # exact match: "Async XLA Ops" is a separate thread carrying async
    # wrapper spans that overlap the leaf ops — substring matching would
    # double-count every op
    op_tids = {k for k, name in tid_names.items()
               if k[0] in dev_pids and name.strip() == "XLA Ops"}
    if not op_tids:  # fall back: all device threads
        op_tids = {k for k in tid_names if k[0] in dev_pids}
    print("device pids:", {p: pid_names[p] for p in dev_pids},
          "op threads:", sorted(tid_names[k] for k in op_tids))
    # aggregate SELF time: loop spans (while.*) cover their body ops,
    # which are emitted as separate nested events on the same thread —
    # summing raw durations double-counts every op inside a loop. Per
    # thread, sort by (start, -dur) and subtract each event's enclosed
    # children via a span stack.
    by_tid = collections.defaultdict(list)
    meta = {}  # op name -> (hlo_category, result-shape snippet)
    for e in events:
        if e.get("ph") != "X" or (e["pid"], e.get("tid")) not in op_tids:
            continue
        name = e.get("name", "?")
        by_tid[(e["pid"], e.get("tid"))].append(
            (e.get("ts", 0), e.get("dur", 0), name))
        if name not in meta:
            args_ = e.get("args", {}) or {}
            long = args_.get("long_name", "")
            # result shape = text between '=' and 'fusion('/op name
            shape = long.split("=", 1)[1].strip().split(" ")[0] if "=" in long else ""
            meta[name] = (args_.get("hlo_category", "?"),
                          shape.split("{")[0])
    agg = collections.Counter()
    total = 0.0
    for evs in by_tid.values():
        evs.sort(key=lambda t: (t[0], -t[1]))
        stack = []  # each: [end_ts, name, start_ts, child_us]

        def close(upto):
            while stack and stack[-1][0] <= upto:
                end, nm, start, child = stack.pop()
                self_us = max(0.0, (end - start) - child)
                agg[nm] += self_us / 1e6
                if stack:
                    stack[-1][3] += end - start
        for ts, dur, name in evs:
            close(ts)
            stack.append([ts + dur, name, ts, 0.0])
        close(float("inf"))
    total = sum(agg.values())
    print(f"\ndevice op self-time total {total:.3f}s over {steps} steps "
          f"({total / steps * 1e3:.1f} ms/step)\n")
    by_cat = collections.Counter()
    for name, dur in agg.items():
        by_cat[meta.get(name, ("?", ""))[0]] += dur
    print(f"{'ms/step':>9}  {'%':>5}  hlo_category")
    for cat, dur in by_cat.most_common():
        print(f"{dur / steps * 1e3:9.2f}  {100 * dur / total:5.1f}  {cat}")
    print(f"\n{'ms/step':>9}  {'%':>5}  op")
    for name, dur in agg.most_common(top):
        cat, shape = meta.get(name, ("?", ""))
        print(f"{dur / steps * 1e3:9.2f}  {100 * dur / total:5.1f}  "
              f"{name[:40]:40s} [{cat}] {shape[:60]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--syn_steps", type=int, default=10)
    ap.add_argument("--graph", choices=("s2d_mtt", "dm"),
                    default="s2d_mtt")
    ap.add_argument("--logdir", default="/tmp/prof")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if not args.parse_only:
        if args.graph == "dm":
            run_dm_steps(args.steps, args.logdir)
        else:
            run_steps(args.steps, args.logdir, args.syn_steps)
    parse_trace(args.logdir, args.steps, args.top)
