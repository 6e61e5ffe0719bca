"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: S2D-MTT outer-step throughput (steps/sec) at the
miniUCF101 ipc=1 configuration (sh/s2d/s2d_MTT_ms.sh): ConvNet3D student,
112x112x16 clips, 50 classes, syn_steps=10 unrolled inner SGD steps with
second-order gradients into (static, dynamic, hallucinator, syn_lr).

The reference publishes no throughput numbers (BASELINE.md); the first run
on a given host records its measurement in ``bench_baseline.json`` and
later runs report ``vs_baseline`` against it, so the driver's BENCH_r{N}
series tracks regressions/improvements across rounds.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")


def bench_s2d_mtt(num_classes=50, frames=16, im=(112, 112), syn_steps=10,
                  warmup=2, iters=10):
    from video_distillation_tpu.distill.mtt import (_build_s2d_mtt_step,
                                                    flat_param_template,
                                                    make_batch_plan)
    from video_distillation_tpu.distill.s2d import S2DConfig, init_s2d_state

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

    n_syn = num_classes * 1
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

    for i in range(warmup):
        state, syn_lr, moms, mom_lr, loss = run(i, state, syn_lr, moms,
                                                mom_lr)
        # force a host transfer: under the tunneled-TPU (axon) relay,
        # block_until_ready alone returns before execution completes —
        # only fetching a value truly synchronises
        float(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        state, syn_lr, moms, mom_lr, loss = run(100 + i, state, syn_lr,
                                                moms, mom_lr)
    # steps chain through on-device state, so dispatching the window and
    # fetching only the final loss is a full sync of all `iters` steps;
    # per-step host fetches would serialise a ~30-50 ms relay round trip
    # into every step (drivers likewise only fetch at log points)
    float(loss)
    dt = time.perf_counter() - t0
    return iters / dt


def main():
    platform = jax.devices()[0].platform
    if platform == "cpu":
        # keep CI/dev runs tractable on CPU
        rate = bench_s2d_mtt(num_classes=4, frames=8, im=(64, 64),
                             syn_steps=2, warmup=1, iters=3)
        metric = "s2d_mtt_outer_steps_per_sec_cpu_small"
    else:
        rate = bench_s2d_mtt()
        metric = "s2d_mtt_outer_steps_per_sec"

    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get(metric)
    if baseline is None:
        data = {}
        if os.path.exists(BASELINE_FILE):
            with open(BASELINE_FILE) as f:
                data = json.load(f)
        data[metric] = rate
        with open(BASELINE_FILE, "w") as f:
            json.dump(data, f)
        baseline = rate

    print(json.dumps({"metric": metric, "value": round(rate, 4),
                      "unit": "steps/sec",
                      "vs_baseline": round(rate / baseline, 4)}))


if __name__ == "__main__":
    main()
