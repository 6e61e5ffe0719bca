"""FRePo S2D distillation driver (TPU rebuild of
``/root/reference/FRePo/script/distill_s2d.py``).

Beyond the torch port, this driver matches the JAX FRePo's extras
(``FRePo/lib/datadistillation/frepo.py``):
* full-state resume incl. the online model pool (``:451-454, :554-581`` —
  the reference restores only the proto state; here the pool, optimizer and
  host RNG resume exactly)
* KRR (least-norm) evaluation in the loop alongside the NN evaluation
  (``:330-340, :530-549`` log both)
* NN evaluation uses the debiased param-EMA of the trained eval net
  (``train_on_proto``, ``:252-276``)
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DistillConfig
from ..distill.evaluate import EvalConfig, evaluate_many
from ..distill.frepo import (FRePoConfig, krr_evaluate, make_frepo_trainer)
from ..utils.checkpoint import (restore_state, save_artifact,
                                save_pytree_artifact, save_state)
from ..utils.logging import MetricLogger, StepTimer
from .common import load_data


def main(argv=None):
    from ..parallel.mesh import ensure_platform_env

    ensure_platform_env()  # honor JAX_PLATFORMS despite the axon config pin
    p = argparse.ArgumentParser(description="FRePo S2D distillation")
    p.add_argument("--dataset", default="miniUCF101")
    p.add_argument("--model", default="ConvNet3D")
    p.add_argument("--num_prototypes_per_class", type=int, default=1)
    p.add_argument("--dpc", type=int, default=1)
    p.add_argument("--n_hal", type=int, default=1)
    p.add_argument("--lr_d", type=float, default=1e2)  # FRePo/script/distill_s2d.py:420
    p.add_argument("--lr_h", type=float, default=1e-3)
    p.add_argument("--lr_net", type=float, default=3e-4)
    p.add_argument("--num_nn_state", type=int, default=10)
    p.add_argument("--max_online_updates", type=int, default=100)
    p.add_argument("--Iteration", type=int, default=10000)
    p.add_argument("--eval_it", type=int, default=2000)
    p.add_argument("--ckpt_it", type=int, default=1000)
    p.add_argument("--num_eval", type=int, default=3)
    p.add_argument("--epoch_eval_train", type=int, default=500)
    p.add_argument("--batch_train", type=int, default=256)
    p.add_argument("--eval_ema_decay", type=float, default=0.995)
    p.add_argument("--learn_label", action="store_true")
    p.add_argument("--eval_mode", default="S",
                   help="eval pool selector (FRePo/script/distill_s2d.py"
                        ":403); each pool model is evaluated per eval step")
    p.add_argument("--shard_store", action="store_true",
                   help="row-shard the uint8 clip store over the mesh")
    p.add_argument("--data_path", default="data")
    p.add_argument("--save_path", default="./logged_files")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--path_static", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    dcfg = DistillConfig(dataset=args.dataset, data_path=args.data_path)
    data = load_data(dcfg)
    meta = data.meta
    cfg = FRePoConfig(num_classes=meta.num_classes,
                      ppc=args.num_prototypes_per_class, dpc=args.dpc,
                      frames=args.frames, im_size=tuple(meta.im_size),
                      n_hal=args.n_hal, lr_d=args.lr_d, lr_h=args.lr_h,
                      lr_net=args.lr_net, num_nn_state=args.num_nn_state,
                      max_online_updates=args.max_online_updates,
                      Iteration=args.Iteration, learn_label=args.learn_label)
    static = np.load(args.path_static) if args.path_static else None
    key = jax.random.PRNGKey(args.seed)
    carry, step, pool, compose_eval = make_frepo_trainer(
        data.train, args.model, cfg, key, static,
        shard_store=args.shard_store)

    save_dir = os.path.join(args.save_path, f"FRePo_{args.dataset}")
    ckpt_dir = os.path.join(save_dir, "ckpt")
    logger = MetricLogger(log_dir=args.save_path,
                          run_name=f"frepo_{args.dataset}")
    np_rng = np.random.default_rng(args.seed)
    test_rng = np.random.default_rng(args.seed + 123)
    timer = StepTimer()

    from ..models.registry import get_eval_pool

    eval_pool = get_eval_pool(args.eval_mode, args.model)
    state, opt_state = carry
    best_acc = {m: 0.0 for m in eval_pool}
    start_it = 1
    restored = restore_state(ckpt_dir, {
        "state": state, "opt_state": opt_state,
        "pool": pool.state_dict(),
        "best_acc": np.zeros(len(eval_pool))})
    if restored is not None:
        st, start_it, rng_state = restored
        state = jax.tree.map(jnp.asarray, st["state"])
        opt_state = jax.tree.map(jnp.asarray, st["opt_state"])
        pool.load_state_dict(st["pool"])
        best_acc = dict(zip(eval_pool, np.asarray(st["best_acc"]).tolist()))
        if rng_state:
            np_rng.bit_generator.state = rng_state
        start_it += 1
        print(f"resumed FRePo run at iteration {start_it}")
    carry = (state, opt_state)

    def evaluate(it):
        state = carry[0]
        # NB: fold_in data must be non-negative (uint32); use a disjoint
        # offset stream for the eval composition like the other drivers
        x_syn = compose_eval(jax.random.fold_in(key, 10_000_000 + it),
                             state)
        y_syn = np.asarray(state["y_syn"])
        # KRR (least-norm) accuracy against a random pool net's features
        el = pool.elements[pool.sample_idx(np_rng)]
        krr_acc = krr_evaluate(
            pool.model_def, el["params"], x_syn, state["y_syn"],
            data.test.sample_clips(test_rng, flip=meta.frames > 1),
            data.test.labels, meta.mean, meta.std, reg=cfg.reg)
        # NN accuracy per eval-pool model (FRePo protocol: AdamW + MSE
        # soft labels + param EMA), looping model_eval_pool like the
        # reference driver (FRePo/script/distill_s2d.py:296-315)
        scalars = {"KRR_Accuracy": krr_acc}
        for model_eval in eval_pool:
            ecfg = EvalConfig(model=model_eval,
                              epoch_eval_train=args.epoch_eval_train,
                              lr_net=args.lr_net,
                              batch_train=args.batch_train,
                              optimizer="adamw", loss="mse",
                              standardize=False, test_repeats=1,
                              ema_decay=args.eval_ema_decay)
            _, mean, std = evaluate_many(jax.random.fold_in(key, it),
                                         args.num_eval, x_syn, y_syn, data,
                                         ecfg, test_rng)
            if mean > best_acc[model_eval]:
                best_acc[model_eval] = mean
                if model_eval == args.model:
                    save_artifact(save_dir, "x_proto_best", x_syn)
                    save_pytree_artifact(save_dir, "state_best", state)
                    from ..utils.visualize import (save_image_grid,
                                                   save_video_grid)
                    png = os.path.join(save_dir, "png",
                                       f"proto_{str(it).zfill(6)}.png")
                    x_np = np.asarray(x_syn)
                    if x_np.ndim == 5:
                        save_video_grid(png, x_np, meta.mean, meta.std)
                    else:
                        save_image_grid(png, x_np, meta.mean, meta.std)
            scalars[f"Accuracy/{model_eval}"] = mean
            scalars[f"Std/{model_eval}"] = std
            scalars[f"Max_Accuracy/{model_eval}"] = best_acc[model_eval]
        logger.log(scalars, step=it)

    for it in range(start_it, cfg.Iteration + 1):
        carry, metrics = step(jax.random.fold_in(key, it), carry, np_rng)
        timer.tick()
        if it % 100 == 0:
            metrics["steps_per_sec"] = timer.rate()
            logger.log(metrics, step=it)
        if it % args.eval_it == 0:
            evaluate(it)
        if it % args.ckpt_it == 0:
            save_state(ckpt_dir, {
                "state": carry[0], "opt_state": carry[1],
                "pool": pool.state_dict(),
                "best_acc": np.asarray([best_acc[m] for m in eval_pool])},
                it, np_rng)
    logger.finish()


if __name__ == "__main__":
    main()
