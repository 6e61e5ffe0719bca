"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: S2D-MTT outer-step throughput (steps/sec) at the
miniUCF101 ipc=1 configuration (sh/s2d/s2d_MTT_ms.sh): ConvNet3D student,
112x112x16 clips, 50 classes, syn_steps=10 unrolled inner SGD steps with
second-order gradients into (static, dynamic, hallucinator, syn_lr).

The JSON line additionally carries an ``extra_metrics`` list covering the
other hot phases — DM outer step, expert-buffer epoch throughput, and the
501-epoch synthetic-set evaluation — each with its own recorded baseline,
so a regression in any phase shows up in the BENCH_r{N} series, not just
the flagship step (the reference publishes no numbers of its own —
BASELINE.md).

The first run on a given host records each measurement in
``bench_baseline.json``; later runs report ``vs_baseline`` against it.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
import traceback

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


def bench_dm(num_classes=50, frames=16, im=(112, 112), ipc=1,
             batch_real=64, clips_per_class=8, warmup=2, iters=10):
    """DM outer step at the sh/baseline/DM.sh shape: one batched embed of
    (C*batch_real) real clips + the synthetic set, segment-mean MSE,
    SGD(0.5) update of the raw synthetic tensor."""
    from video_distillation_tpu.data import make_synthetic_video_data
    from video_distillation_tpu.distill.dm import (DMState,
                                                   init_synthetic_raw,
                                                   make_dm_trainer)

    data = make_synthetic_video_data(num_classes=num_classes,
                                     clips_per_class=clips_per_class,
                                     test_per_class=1, frames=frames,
                                     im_size=im, name="bench-dm")
    rng = np.random.default_rng(0)
    syn, labels = init_synthetic_raw(jax.random.PRNGKey(0), data.train,
                                     ipc, frames, "real", rng)
    state = DMState(syn, labels, jnp.zeros_like(syn))
    trainer = make_dm_trainer(data.train, "ConvNet3D", ipc, batch_real,
                              1.0, frames, "bfloat16")
    key = jax.random.PRNGKey(1)
    for i in range(warmup):
        state, loss = trainer(jax.random.fold_in(key, i), state, rng)
        float(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        state, loss = trainer(jax.random.fold_in(key, 100 + i), state, rng)
    float(loss)
    return iters / (time.perf_counter() - t0)


def bench_buffer_epoch(num_classes=50, frames=16, im=(112, 112),
                       clips_per_class=16, batch=256, warmup=1, iters=3):
    """Expert-training epoch throughput (clips/sec): the buffer.py teacher
    loop — one jitted scan per epoch over the real store (bf16)."""
    from video_distillation_tpu.config import BufferConfig
    from video_distillation_tpu.data import make_synthetic_video_data
    from video_distillation_tpu.distill.buffer import (_build_epoch_fn,
                                                       _cdiv)
    from video_distillation_tpu.models.registry import create_model
    from video_distillation_tpu.parallel import replicate_array

    data = make_synthetic_video_data(num_classes=num_classes,
                                     clips_per_class=clips_per_class,
                                     test_per_class=1, frames=frames,
                                     im_size=im, name="bench-buffer")
    store = data.train
    meta = store.meta
    cfg = BufferConfig(batch_train=batch, frames=frames)
    model_def = create_model(cfg.model, meta.channel, meta.num_classes,
                             tuple(meta.im_size), frames)
    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, frames) + tuple(meta.im_size) + (meta.channel,))
    params = model_def.init({"params": key, "dropout": key}, sample,
                            train=False)["params"]
    mom = jax.tree.map(jnp.zeros_like, params)
    n = len(store)
    b = min(batch, n)
    nb = _cdiv(n, b)
    epoch_fn = _build_epoch_fn(cfg.model, meta.channel, meta.num_classes,
                               tuple(meta.im_size), frames, b, nb,
                               cfg.mom, cfg.l2, True, "bfloat16")
    clips_dev = replicate_array(store.device_clips())
    labels_dev = replicate_array(store.labels)
    norm_mean = jnp.asarray(meta.mean, jnp.float32) * 255.0
    norm_std = jnp.asarray(meta.std, jnp.float32) * 255.0
    rng = np.random.default_rng(0)

    def one_epoch(params, mom, e):
        perm = rng.permutation(n)
        pad = nb * b - n
        if pad:
            perm = np.concatenate([perm, np.full(pad, -1, perm.dtype)])
        plan = jnp.asarray(perm.reshape(nb, b).astype(np.int32))
        ek = jax.random.fold_in(key, e + 1)
        return epoch_fn(params, mom, clips_dev, labels_dev, plan, 0.01, ek,
                        norm_mean, norm_std)

    for e in range(warmup):
        params, mom, loss, acc = one_epoch(params, mom, e)
        float(loss)
    t0 = time.perf_counter()
    for e in range(iters):
        params, mom, loss, acc = one_epoch(params, mom, 100 + e)
    float(loss)
    dt = time.perf_counter() - t0
    return iters * n / dt  # clips/sec


def bench_eval(num_classes=50, frames=16, im=(112, 112), ipc=1,
               epochs=500, test_per_class=2):
    """The wall-clock-dominant phase: evaluate_synset's compiled
    ``epoch_eval_train``-epoch training scan on a fresh ConvNet3D
    (reported as training epochs/sec; the test pass is excluded — its
    cost on this host is relay transfer, not device compute)."""
    from video_distillation_tpu.data import make_synthetic_video_data
    from video_distillation_tpu.distill.evaluate import (EvalConfig,
                                                         _build_train_fn)

    data = make_synthetic_video_data(num_classes=num_classes,
                                     clips_per_class=1,
                                     test_per_class=test_per_class,
                                     frames=frames, im_size=im,
                                     name="bench-eval")
    cfg = EvalConfig(model="ConvNet3D", epoch_eval_train=epochs,
                     lr_net=0.01, batch_train=256)
    meta = data.meta
    n_syn = num_classes * ipc
    syn = jax.random.normal(
        jax.random.PRNGKey(0),
        (n_syn, frames, im[0], im[1], 3), jnp.float32)
    labels = jnp.asarray(np.repeat(np.arange(num_classes), ipc))
    train_fn, _ = _build_train_fn(
        cfg.model, meta.channel, meta.num_classes, tuple(meta.im_size),
        frames, n_syn, cfg, None)
    key = jax.random.PRNGKey(1)
    # warmup (compile + one full scan), then time one scan; fetching the
    # scalar loss is the honest sync on the axon relay
    _, _, loss = train_fn(key, syn, labels,
                          jnp.asarray(cfg.lr_net, jnp.float32))
    float(loss)
    t0 = time.perf_counter()
    _, _, loss = train_fn(jax.random.fold_in(key, 1), syn, labels,
                          jnp.asarray(cfg.lr_net, jnp.float32))
    float(loss)
    dt = time.perf_counter() - t0
    return (epochs + 1) / dt  # training epochs/sec


def _record(metric, value, unit):
    data = {}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            data = json.load(f)
    baseline = data.get(metric)
    if baseline is None:
        data[metric] = value
        with open(BASELINE_FILE, "w") as f:
            json.dump(data, f)
        baseline = value
    return {"metric": metric, "value": round(value, 4), "unit": unit,
            "vs_baseline": round(value / baseline, 4)}


def main():
    platform = jax.devices()[0].platform
    cpu = platform == "cpu"
    if cpu:
        # keep CI/dev runs tractable on CPU
        rate = bench_s2d_mtt(num_classes=4, frames=8, im=(64, 64),
                             syn_steps=2, warmup=1, iters=3)
        head = _record("s2d_mtt_outer_steps_per_sec_cpu_small", rate,
                       "steps/sec")
    else:
        rate = bench_s2d_mtt()
        head = _record("s2d_mtt_outer_steps_per_sec", rate, "steps/sec")

    extras = []
    specs = [
        ("dm_outer_steps_per_sec", "steps/sec", bench_dm,
         dict(num_classes=4, frames=8, im=(64, 64), batch_real=4,
              clips_per_class=4, warmup=1, iters=2) if cpu else {}),
        ("buffer_epoch_clips_per_sec", "clips/sec", bench_buffer_epoch,
         dict(num_classes=4, frames=8, im=(64, 64), clips_per_class=4,
              batch=8, warmup=1, iters=1) if cpu else {}),
        ("eval_train_epochs_per_sec", "epochs/sec", bench_eval,
         dict(num_classes=4, frames=8, im=(64, 64), epochs=20,
              test_per_class=1) if cpu else {}),
    ]
    for name, unit, fn, kwargs in specs:
        metric = name + ("_cpu_small" if cpu else "")
        try:
            extras.append(_record(metric, fn(**kwargs), unit))
        except Exception:
            traceback.print_exc()
            extras.append({"metric": metric, "value": None, "unit": unit,
                           "vs_baseline": None})

    out = dict(head)
    out["extra_metrics"] = extras
    print(json.dumps(out))


if __name__ == "__main__":
    main()
