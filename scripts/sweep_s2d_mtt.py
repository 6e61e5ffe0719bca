"""S2D-MTT hyperparameter sweep on the 10-class synthetic set.

Round-2 left a loose end (BASELINE.md): the toy S2D-MTT run reached 29.6%
top-1 at 400 iterations but a 1600-iteration run peaked lower (17.5%)
despite lower grand loss. This sweep searches (lr_dynamic, lr_hal, lr_lr,
epoch_eval_train) for a setting where longer training monotonically
improves distilled accuracy — the reference behaviour its tuned per-dataset
LRs produce (sh/s2d/s2d_MTT_ms.sh passes lr_dynamic/lr_hal per dataset).

Writes one JSON line per config to --out (accuracy at each eval point).

Usage: python scripts/sweep_s2d_mtt.py [--iters 1600] [--quick]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_distillation_tpu.parallel.mesh import ensure_platform_env

ensure_platform_env()  # JAX_PLATFORMS=cpu works despite the axon pin


def build_fixture(num_classes=10, frames=16, im=(112, 112),
                  clips_per_class=20, expert_epochs_total=20, n_experts=4,
                  seed=0):
    from video_distillation_tpu.config import BufferConfig
    from video_distillation_tpu.data import make_synthetic_video_data
    from video_distillation_tpu.distill.buffer import train_expert
    from video_distillation_tpu.distill.mtt import TrajectoryBuffer

    data = make_synthetic_video_data(num_classes=num_classes,
                                     clips_per_class=clips_per_class,
                                     test_per_class=5, frames=frames,
                                     im_size=im, seed=seed,
                                     name="sweep10")
    bcfg = BufferConfig(num_experts=n_experts,
                        train_epochs=expert_epochs_total,
                        batch_train=64, frames=frames,
                        compute_dtype="bfloat16")
    # expert training is ~6 min of TPU; cache trajectories across
    # relaunches of the same fixture config (data itself is regenerated
    # deterministically from the seed above)
    cache = (f"/tmp/sweep_fixture_c{num_classes}_f{frames}_i{im[0]}"
             f"_cpc{clips_per_class}_e{expert_epochs_total}"
             f"_n{n_experts}_s{seed}.npz")
    if os.path.exists(cache):
        with np.load(cache) as z:
            trajs = z["trajs"]
        print(f"loaded cached expert trajectories from {cache}")
    else:
        np_rng = np.random.default_rng(seed)
        out = []
        for e in range(n_experts):
            traj, acc = train_expert(
                jax.random.fold_in(jax.random.PRNGKey(seed), e), data.train,
                bcfg, np_rng)
            out.append(traj)
            print(f"expert {e}: final train acc {acc:.3f}")
        trajs = np.stack(out)
        np.savez_compressed(cache, trajs=trajs)
    buffers = [TrajectoryBuffer(trajs)]

    # pretrained static memory: spc random real frames per class,
    # normalized — the toy stand-in for the reference's --path_static
    # artifact (sh/s2d scripts always load one)
    spc = 2
    rng = np.random.default_rng(seed + 1)
    idx = data.train.sample_per_class(rng, spc).reshape(-1)
    frames_sel = data.train.clips[idx][:, 0]  # (C*spc, H, W, 3) uint8
    mean = np.asarray(data.meta.mean, np.float32) * 255.0
    std = np.asarray(data.meta.std, np.float32) * 255.0
    static = (frames_sel.astype(np.float32) - mean) / std
    return data, buffers, static


def run_config(data, buffers, static, hp, iters, eval_every, num_eval,
               seed=0):
    from video_distillation_tpu.distill.evaluate import (EvalConfig,
                                                         evaluate_many)
    from video_distillation_tpu.distill.mtt import (ExpertSampler,
                                                    _build_s2d_mtt_step,
                                                    make_batch_plan)
    from video_distillation_tpu.distill.s2d import S2DConfig, init_s2d_state

    meta = data.meta
    s2d_cfg = S2DConfig(num_classes=meta.num_classes, spc=2, dpc=2, vpc=1,
                        n_hal=1, frames=meta.frames,
                        im_size=tuple(meta.im_size))
    state = init_s2d_state(jax.random.PRNGKey(seed), s2d_cfg)
    state["static"] = jnp.asarray(static)
    s2d_items = tuple(sorted(dataclasses.asdict(s2d_cfg).items()))
    step_fn = _build_s2d_mtt_step(
        "ConvNet3D", 3, meta.num_classes, tuple(meta.im_size), meta.frames,
        syn_steps=hp["syn_steps"], s2d_items=s2d_items, lr_static=100.0,
        lr_dynamic=hp["lr_dynamic"], lr_hal=hp["lr_hal"],
        lr_lr=hp["lr_lr"], train_static=False, train_lr=True,
        compute_dtype="bfloat16")
    rng = np.random.default_rng(seed)
    test_rng = np.random.default_rng(seed + 123)
    key = jax.random.PRNGKey(seed)
    sampler = ExpertSampler(buffers, rng)
    moms = jax.tree.map(jnp.zeros_like, state)
    syn_lr = jnp.asarray(hp["lr_teacher"])
    mom_lr = jnp.zeros(())
    n_syn = meta.num_classes * s2d_cfg.vpc

    ecfg = EvalConfig(model="ConvNet3D",
                      epoch_eval_train=hp["epoch_eval_train"],
                      lr_net=0.01, batch_train=64, mode="multi-static")
    curve = {}
    for it in range(iters + 1):
        if it % eval_every == 0:
            # the reference evaluates at the CURRENT learned syn_lr
            # (distill_s2d_ms.py:153 args.lr_net = syn_lr.detach());
            # lr_net is a traced arg so this never recompiles. The r5
            # first sweep attempt pinned lr_net=0.01 while syn_lr drifted
            # to ~1e-3 — every config evaluated flat at chance
            # (sweep_r5_uncoupled_eval.jsonl).
            ecfg_it = dataclasses.replace(ecfg, lr_net=float(syn_lr))
            _, mean_acc, std_acc = evaluate_many(
                jax.random.fold_in(key, 10_000_000 + it), num_eval, None,
                None, data, ecfg_it, test_rng, s2d_cfg=s2d_cfg,
                s2d_state=state)
            # record the learned syn_lr too: acc tracks it inversely
            # (the eval is coupled to it, like the reference), so the
            # curve is uninterpretable without it
            curve[it] = (round(mean_acc, 4), round(std_acc, 4),
                         round(float(syn_lr), 6))
            print(f"  it={it} acc={mean_acc:.4f}+-{std_acc:.4f} "
                  f"syn_lr={float(syn_lr):.4f}")
        if it == iters:
            break
        th0, th1, _ = sampler.sample_segment(hp["max_start_epoch"],
                                             hp["expert_epochs"])
        plan = jnp.asarray(make_batch_plan(rng, n_syn, n_syn,
                                           hp["syn_steps"]))
        out = step_fn(jax.random.fold_in(key, it), state, syn_lr, moms,
                      mom_lr, jnp.asarray(th0), jnp.asarray(th1), plan)
        state, syn_lr, moms, mom_lr = out[:4]
        if it % 200 == 0:
            gl = float(out[4])
            rss_gb = resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss / 1e6
            print(f"  it={it} grand_loss={gl:.4f} rss={rss_gb:.1f}GB")
            if not np.isfinite(gl):
                # LR divergence (documented 1e-2 behaviour): the rest of
                # the config would coast through nan — record and move on
                print("  non-finite grand loss: aborting config")
                return curve, it
            if rss_gb > 90.0:
                # per-dispatch host leak under the axon relay client
                # (the r5 full run was OOM-killed at 130 GB): bail with
                # the partial curve instead of losing the process
                print("  rss watchdog: aborting config before host OOM")
                return curve, it
    return curve, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1600)
    ap.add_argument("--eval_every", type=int, default=200)
    ap.add_argument("--num_eval", type=int, default=2)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", type=int, default=-1,
                    help="run a single grid config by index. The r5 full "
                         "run was OOM-killed at 130 GB host RSS after "
                         "~4200 outer dispatches (per-dispatch host leak "
                         "under the axon relay client) — drive one config "
                         "per process so the leak is bounded per run.")
    ap.add_argument("--out", default="/tmp/sweep_s2d_mtt.jsonl")
    args = ap.parse_args()

    if args.quick:
        data, buffers, static = build_fixture(
            num_classes=4, frames=8, im=(64, 64), clips_per_class=6,
            expert_epochs_total=6, n_experts=2)
        grid = [dict(lr_dynamic=0.01, lr_hal=0.01, lr_lr=1e-5,
                     lr_teacher=0.01, epoch_eval_train=10, syn_steps=2,
                     expert_epochs=1, max_start_epoch=4)]
        args.iters, args.eval_every = 20, 10
    else:
        data, buffers, static = build_fixture()
        # epoch_eval_train=500 matches the reference preset
        # (sh/s2d/s2d_MTT_ms.sh:15); at n_syn=10 that is 500 batch-10
        # steps — 150 under-trains the eval net at the coupled
        # (learned, ~1e-3) eval LR. The 1e-2/1e-2 round-2 setting is
        # dropped: it diverged to nan by it=200 in both r5 attempts
        # (sweep_r5_uncoupled_eval.jsonl + sweep_r5b.log) — the
        # documented LR sensitivity.
        base = dict(lr_lr=1e-5, lr_teacher=0.01, syn_steps=10,
                    expert_epochs=1, max_start_epoch=10,
                    epoch_eval_train=500)
        grid = [
            dict(base, lr_dynamic=1e-3, lr_hal=1e-3),
            dict(base, lr_dynamic=1e-3, lr_hal=1e-4),
            dict(base, lr_dynamic=1e-4, lr_hal=1e-4),
            dict(base, lr_dynamic=1e-2, lr_hal=1e-3, lr_lr=1e-7),
            dict(base, lr_dynamic=1e-3, lr_hal=1e-3, epoch_eval_train=150),
        ]

    if args.only >= 0:
        grid = [grid[args.only]]

    with open(args.out, "a") as f:
        for hp in grid:
            print("=== config:", hp)
            t0 = time.time()
            curve, diverged_at = run_config(data, buffers, static, hp,
                                            args.iters, args.eval_every,
                                            args.num_eval)
            rec = {"hp": hp, "curve": curve,
                   "diverged_at": diverged_at,
                   "wall_sec": round(time.time() - t0, 1)}
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(json.dumps(rec))


if __name__ == "__main__":
    main()
