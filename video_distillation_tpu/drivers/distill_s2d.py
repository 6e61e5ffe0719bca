"""S2D multi-static distillation driver (the paper's method).

TPU rebuild of ``/root/reference/distill_s2d_ms.py``: learnable static
memory (optionally frozen/pretrained), dynamic memory, hallucinators;
DM or MTT outer loss.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DistillConfig
from ..distill.buffer import load_buffers
from ..distill.dm import init_s2d_momentum, make_s2d_dm_trainer
from ..distill.mtt import ExpertSampler, _build_s2d_mtt_step, make_batch_plan
from ..distill.s2d import S2DConfig, compose_synthetic, init_s2d_state
from ..utils.checkpoint import (restore_state, save_artifact,
                                save_pytree_artifact, save_state)
from ..utils.visualize import save_s2d_grids
from ..utils.logging import MetricLogger, StepTimer
from .common import EvalTracker, load_data, parse_config_args


def build_s2d(cfg: DistillConfig, meta):
    s2d_cfg = S2DConfig(num_classes=meta.num_classes, spc=cfg.spc,
                        dpc=cfg.dpc, vpc=cfg.vpc, n_hal=cfg.n_hal,
                        frames=cfg.frames, im_size=tuple(meta.im_size))
    state = init_s2d_state(jax.random.PRNGKey(cfg.seed), s2d_cfg)
    if cfg.path_static:
        static = np.load(cfg.path_static)
        if static.ndim == 4 and static.shape[1] == 3:  # torch NCHW artifact
            static = np.transpose(static, (0, 2, 3, 1))
        state["static"] = jnp.asarray(static)
    return s2d_cfg, state


def run(cfg: DistillConfig, data, logger: MetricLogger):
    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    meta = data.meta
    s2d_cfg, state = build_s2d(cfg, meta)
    moms = init_s2d_momentum(state)
    save_dir = os.path.join(cfg.save_path,
                            f"S2D_multis_{cfg.method}_{cfg.dataset}")
    ckpt_dir = os.path.join(save_dir, "ckpt")
    holder = {"state": state, "syn_lr": jnp.asarray(float(cfg.lr_teacher))}
    mom_lr = jnp.zeros(())
    start_it = 0
    restored = restore_state(ckpt_dir, {"state": state, "moms": moms,
                                        "syn_lr": holder["syn_lr"],
                                        "mom_lr": mom_lr})
    if restored is not None:
        st, start_it, rng_state = restored
        holder["state"] = jax.tree.map(jnp.asarray, st["state"])
        moms = jax.tree.map(jnp.asarray, st["moms"])
        holder["syn_lr"] = jnp.asarray(st["syn_lr"])
        # mom_lr (the learnable-lr SGD momentum buffer) must round-trip for
        # exact resume
        mom_lr = jnp.asarray(st["mom_lr"])
        if rng_state:
            rng.bit_generator.state = rng_state
        start_it += 1
        print(f"resumed S2D run at iteration {start_it}")

    def save(it, best):
        st = holder["state"]
        if not cfg.no_train_static:
            save_artifact(save_dir, f"images_{it}", st["static"])
        save_artifact(save_dir, f"dynamic_{it}",
                      st["dynamic"].reshape((-1,) + st["dynamic"].shape[2:]))
        # the hallucinator is part of the distilled set — without it the
        # output dir is not re-evaluable (hal_{it}.pt, distill_s2d_ms.py:
        # 175-193)
        save_pytree_artifact(save_dir, f"hal_{it}", st["hals"])
        if best:
            save_artifact(save_dir, "dynamic_best",
                          st["dynamic"].reshape((-1,) +
                                                st["dynamic"].shape[2:]))
            save_pytree_artifact(save_dir, "hal_best", st["hals"])
            if not cfg.no_train_static:
                save_artifact(save_dir, "images_best", st["static"])
        # PNG grids for inspection (reference capability:
        # FRePo/lib/datadistillation/utils.py:40-118)
        videos, _ = compose_synthetic(jax.random.PRNGKey(it), st, s2d_cfg)
        save_s2d_grids(save_dir, it, static=np.asarray(st["static"]),
                       dynamic=np.asarray(st["dynamic"]),
                       videos=np.asarray(videos),
                       mean=meta.mean, std=meta.std)

    tracker = EvalTracker(cfg, data, logger, save_dir, save)
    timer = StepTimer()

    if cfg.method == "DM":
        trainer = make_s2d_dm_trainer(
            data.train, cfg.model, s2d_cfg, cfg.batch_real, cfg.lr_static,
            cfg.lr_dynamic, cfg.lr_hal, not cfg.no_train_static, cfg.frames,
            cfg.compute_dtype, shard_store=cfg.shard_store)
        for it in range(start_it, cfg.Iteration + 1):
            if tracker.should_eval(it):
                tracker.maybe_eval(
                    it, jax.random.fold_in(key, 10_000_000 + it), None,
                    None, float(holder["syn_lr"]), s2d_cfg=s2d_cfg,
                    s2d_state=holder["state"])
            holder["state"], moms, loss = trainer(
                jax.random.fold_in(key, it), holder["state"], moms, rng)
            timer.tick()
            if it % 100 == 0:
                logger.log({"Loss": float(loss) / meta.num_classes,
                            "steps_per_sec": timer.rate()}, step=it)
            if it % 1000 == 0 and it > 0:
                save_state(ckpt_dir, {"state": holder["state"],
                                      "moms": moms,
                                      "syn_lr": holder["syn_lr"],
                                      "mom_lr": mom_lr}, it, rng)
    elif cfg.method == "MTT":
        buffers = load_buffers(cfg.buffer_path)
        sampler = ExpertSampler(buffers, rng)
        n_syn = meta.num_classes * cfg.vpc
        batch_syn = cfg.resolved_batch_syn(meta.num_classes)
        s2d_items = tuple(sorted(dataclasses.asdict(s2d_cfg).items()))
        step_fn = _build_s2d_mtt_step(
            cfg.model, meta.channel, meta.num_classes, tuple(meta.im_size),
            cfg.frames, cfg.syn_steps, s2d_items, cfg.lr_static,
            cfg.lr_dynamic, cfg.lr_hal, cfg.lr_lr,
            not cfg.no_train_static, cfg.train_lr, cfg.compute_dtype,
            cfg.second_order)
        from ..parallel import pad_and_shard_plan
        # double-buffered expert segments: device_put of the NEXT
        # θ_start/θ_target (2 x ~15 MB host->device) overlaps the current
        # step's compute instead of serialising into each iteration
        theta0, theta1, start_epoch = sampler.sample_segment(
            cfg.max_start_epoch, cfg.expert_epochs)
        seg_dev = (jnp.asarray(theta0), jnp.asarray(theta1), start_epoch)
        for it in range(start_it, cfg.Iteration + 1):
            if tracker.should_eval(it):
                tracker.maybe_eval(
                    it, jax.random.fold_in(key, 10_000_000 + it), None,
                    None, float(holder["syn_lr"]), s2d_cfg=s2d_cfg,
                    s2d_state=holder["state"])
            theta0_dev, theta1_dev, start_epoch = seg_dev
            plan = pad_and_shard_plan(make_batch_plan(rng, n_syn, batch_syn,
                                                      cfg.syn_steps))
            out = step_fn(jax.random.fold_in(key, it), holder["state"],
                          holder["syn_lr"], moms, mom_lr,
                          theta0_dev, theta1_dev, plan)
            theta0, theta1, next_start = sampler.sample_segment(
                cfg.max_start_epoch, cfg.expert_epochs)
            seg_dev = (jnp.asarray(theta0), jnp.asarray(theta1), next_start)
            holder["state"], holder["syn_lr"], moms, mom_lr = out[:4]
            loss, ploss, pdist = out[4:]
            timer.tick()
            if it % 10 == 0:
                logger.log({"Grand_Loss": float(loss),
                            "Start_Epoch": start_epoch,
                            "Synthetic_LR": float(holder["syn_lr"]),
                            "steps_per_sec": timer.rate()}, step=it)
            if it % 1000 == 0 and it > 0:
                save_state(ckpt_dir, {"state": holder["state"],
                                      "moms": moms,
                                      "syn_lr": holder["syn_lr"],
                                      "mom_lr": mom_lr}, it, rng)
    else:
        raise NotImplementedError(cfg.method)
    return holder


def main(argv=None):
    cfg = parse_config_args("S2D distillation", argv,
                            default_preset="s2d_MTT_ms")
    cfg.s2d = True
    data = load_data(cfg)
    logger = MetricLogger(log_dir=cfg.save_path,
                          run_name=f"s2d_{cfg.method}_{cfg.dataset}")
    run(cfg, data, logger)
    logger.finish()


if __name__ == "__main__":
    main()
