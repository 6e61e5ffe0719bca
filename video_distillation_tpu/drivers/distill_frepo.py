"""FRePo S2D distillation driver (TPU rebuild of
``/root/reference/FRePo/script/distill_s2d.py``)."""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ..config import DistillConfig
from ..distill.evaluate import EvalConfig, evaluate_many
from ..distill.frepo import FRePoConfig, frepo_labels, make_frepo_trainer
from ..utils.logging import MetricLogger, StepTimer
from .common import load_data


def main(argv=None):
    p = argparse.ArgumentParser(description="FRePo S2D distillation")
    p.add_argument("--dataset", default="miniUCF101")
    p.add_argument("--model", default="ConvNet3D")
    p.add_argument("--num_prototypes_per_class", type=int, default=1)
    p.add_argument("--dpc", type=int, default=1)
    p.add_argument("--n_hal", type=int, default=1)
    p.add_argument("--lr_d", type=float, default=1e3)
    p.add_argument("--lr_h", type=float, default=1e-3)
    p.add_argument("--lr_net", type=float, default=3e-4)
    p.add_argument("--num_nn_state", type=int, default=10)
    p.add_argument("--max_online_updates", type=int, default=100)
    p.add_argument("--Iteration", type=int, default=10000)
    p.add_argument("--eval_it", type=int, default=2000)
    p.add_argument("--num_eval", type=int, default=3)
    p.add_argument("--epoch_eval_train", type=int, default=500)
    p.add_argument("--batch_train", type=int, default=256)
    p.add_argument("--learn_label", action="store_true")
    p.add_argument("--data_path", default="data")
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
        data.train, args.model, cfg, key, static)

    logger = MetricLogger(run_name=f"frepo_{args.dataset}")
    np_rng = np.random.default_rng(args.seed)
    test_rng = np.random.default_rng(args.seed + 123)
    timer = StepTimer()
    y_scale = float(np.sqrt(meta.num_classes / 10.0))
    for it in range(1, cfg.Iteration + 1):
        carry, metrics = step(jax.random.fold_in(key, it), carry, np_rng)
        timer.tick()
        if it % 100 == 0:
            metrics["steps_per_sec"] = timer.rate()
            logger.log(metrics, step=it)
        if it % args.eval_it == 0:
            # NN evaluation with the FRePo protocol (AdamW + MSE soft
            # labels — lib_torch/utils.py:561-603)
            state = carry[0]
            x_syn = compose_eval(jax.random.fold_in(key, -it), state)
            y_syn = np.asarray(state["y_syn"])
            ecfg = EvalConfig(model=args.model,
                              epoch_eval_train=args.epoch_eval_train,
                              lr_net=args.lr_net,
                              batch_train=args.batch_train,
                              optimizer="adamw", loss="mse",
                              standardize=False, test_repeats=1)
            _, mean, std = evaluate_many(jax.random.fold_in(key, it),
                                         args.num_eval, x_syn, y_syn, data,
                                         ecfg, test_rng)
            logger.log({"Accuracy": mean, "Std": std}, step=it)
    logger.finish()


if __name__ == "__main__":
    main()
