"""Baseline distillation driver (DM / MTT on raw synthetic tensors).

The TPU rebuild of ``/root/reference/distill_baseline.py``. Usage:

    python -m video_distillation_tpu.drivers.distill_baseline \
        --preset DM --dataset miniUCF101 --ipc 1 --lr_img 1.0

Supports full-state resume (orbax) — which the torch driver lacks.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DistillConfig
from ..distill.buffer import load_buffers
from ..distill.dm import DMState, init_synthetic_raw, make_dm_trainer
from ..distill.mtt import ExpertSampler, _build_mtt_step, make_batch_plan
from ..parallel import pad_and_shard_plan
from ..utils.checkpoint import restore_state, save_artifact, save_state
from ..utils.visualize import save_video_grid
from ..utils.logging import MetricLogger, StepTimer
from .common import EvalTracker, load_data, parse_config_args




def run_dm(cfg: DistillConfig, data, logger: MetricLogger):
    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    syn, labels = init_synthetic_raw(key, data.train, cfg.ipc, cfg.frames,
                                     cfg.init, rng)
    state = DMState(syn, labels, jnp.zeros_like(syn))
    trainer = make_dm_trainer(data.train, cfg.model, cfg.ipc,
                              cfg.batch_real, cfg.lr_img, cfg.frames,
                              cfg.compute_dtype,
                              shard_store=cfg.shard_store)
    save_dir = os.path.join(cfg.save_path, f"Baseline_DM_{cfg.dataset}")
    ckpt_dir = os.path.join(save_dir, "ckpt")
    start_it = 0
    restored = restore_state(ckpt_dir, {"syn": state.syn_images,
                                        "mom": state.momentum})
    if restored is not None:
        st, start_it, rng_state = restored
        state = DMState(jnp.asarray(st["syn"]), labels,
                        jnp.asarray(st["mom"]))
        if rng_state:
            rng.bit_generator.state = rng_state
        start_it += 1
        print(f"resumed DM run at iteration {start_it}")

    def save(it, best):
        save_artifact(save_dir, f"images_{it}", state.syn_images)
        if best:
            save_artifact(save_dir, "images_best", state.syn_images)
        save_video_grid(os.path.join(save_dir, "png",
                                     f"videos_{str(it).zfill(6)}.png"),
                        np.asarray(state.syn_images),
                        mean=data.meta.mean, std=data.meta.std)

    tracker = EvalTracker(cfg, data, logger, save_dir, save)
    timer = StepTimer()
    for it in range(start_it, cfg.Iteration + 1):
        tracker.maybe_eval(it, jax.random.fold_in(key, 10_000_000 + it),
                           state.syn_images, state.labels, cfg.lr_net)
        state, loss = trainer(jax.random.fold_in(key, it), state, rng)
        timer.tick()
        if it % 100 == 0:
            logger.log({"Loss": float(loss) / data.meta.num_classes,
                        "steps_per_sec": timer.rate()}, step=it)
        if it % 1000 == 0 and it > 0:
            save_state(ckpt_dir, {"syn": state.syn_images,
                                  "mom": state.momentum}, it, rng)
    return state


def run_mtt(cfg: DistillConfig, data, logger: MetricLogger):
    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    meta = data.meta
    syn, labels = init_synthetic_raw(key, data.train, cfg.ipc, cfg.frames,
                                     cfg.init, rng)
    n_syn = syn.shape[0]
    batch_syn = cfg.resolved_batch_syn(meta.num_classes)

    buffers = load_buffers(cfg.buffer_path)
    sampler = ExpertSampler(buffers, rng)

    step_fn = _build_mtt_step(cfg.model, meta.channel, meta.num_classes,
                              tuple(meta.im_size), cfg.frames,
                              cfg.syn_steps, cfg.lr_img, cfg.lr_lr,
                              cfg.train_lr, cfg.compute_dtype, cfg.second_order)
    syn_lr = jnp.asarray(float(cfg.lr_teacher))
    mom_img = jnp.zeros_like(syn)
    mom_lr = jnp.zeros(())
    save_dir = os.path.join(cfg.save_path, f"Baseline_MTT_{cfg.dataset}")
    ckpt_dir = os.path.join(save_dir, "ckpt")
    start_it = 0
    restored = restore_state(ckpt_dir, {"syn": syn, "syn_lr": syn_lr,
                                        "mom_img": mom_img,
                                        "mom_lr": mom_lr})
    if restored is not None:
        st, start_it, rng_state = restored
        syn = jnp.asarray(st["syn"])
        syn_lr = jnp.asarray(st["syn_lr"])
        mom_img = jnp.asarray(st["mom_img"])
        mom_lr = jnp.asarray(st["mom_lr"])
        if rng_state:
            rng.bit_generator.state = rng_state
        start_it += 1
        print(f"resumed MTT run at iteration {start_it}")

    holder = {"syn": syn}

    def save(it, best):
        save_artifact(save_dir, f"images_{it}", holder["syn"])
        if best:
            save_artifact(save_dir, "images_best", holder["syn"])
        save_video_grid(os.path.join(save_dir, "png",
                                     f"videos_{str(it).zfill(6)}.png"),
                        np.asarray(holder["syn"]),
                        mean=data.meta.mean, std=data.meta.std)

    tracker = EvalTracker(cfg, data, logger, save_dir, save)
    timer = StepTimer()
    # double-buffered expert segments: the NEXT θ_start/θ_target upload
    # overlaps the current step's compute (see drivers/distill_s2d.py)
    theta0, theta1, start_epoch = sampler.sample_segment(
        cfg.max_start_epoch, cfg.expert_epochs)
    seg_dev = (jnp.asarray(theta0), jnp.asarray(theta1), start_epoch)
    for it in range(start_it, cfg.Iteration + 1):
        if tracker.should_eval(it):
            tracker.maybe_eval(it, jax.random.fold_in(key, 10_000_000 + it),
                               holder["syn"], labels, float(syn_lr))
        theta0_dev, theta1_dev, start_epoch = seg_dev
        # plan sharded over the batch axis (padded with masked -1 entries,
        # never silently replicated)
        plan = pad_and_shard_plan(make_batch_plan(rng, n_syn, batch_syn,
                                                  cfg.syn_steps))
        out = step_fn(jax.random.fold_in(key, it), holder["syn"], labels,
                      syn_lr, mom_img, mom_lr, theta0_dev,
                      theta1_dev, plan)
        theta0, theta1, next_start = sampler.sample_segment(
            cfg.max_start_epoch, cfg.expert_epochs)
        seg_dev = (jnp.asarray(theta0), jnp.asarray(theta1), next_start)
        holder["syn"], syn_lr, mom_img, mom_lr, loss, ploss, pdist = out
        timer.tick()
        if it % 50 == 0:
            logger.log({"Grand_Loss": float(loss),
                        "Start_Epoch": start_epoch,
                        "Synthetic_LR": float(syn_lr),
                        "steps_per_sec": timer.rate()}, step=it)
        if it % 1000 == 0 and it > 0:
            save_state(ckpt_dir, {"syn": holder["syn"], "syn_lr": syn_lr,
                                  "mom_img": mom_img, "mom_lr": mom_lr},
                       it, rng)
    return holder["syn"], labels, syn_lr


def main(argv=None):
    cfg = parse_config_args("DM/MTT baseline distillation", argv)
    data = load_data(cfg)
    logger = MetricLogger(log_dir=cfg.save_path,
                          run_name=f"{cfg.method}_{cfg.dataset}_ipc{cfg.ipc}")
    if cfg.method == "DM":
        run_dm(cfg, data, logger)
    elif cfg.method == "MTT":
        run_mtt(cfg, data, logger)
    else:
        raise NotImplementedError(cfg.method)
    logger.finish()


if __name__ == "__main__":
    main()
