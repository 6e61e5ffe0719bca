"""Coreset baseline driver (TPU rebuild of
``/root/reference/distill_coreset.py``)."""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ..config import DistillConfig
from ..distill.coreset import select_coreset
from ..distill.evaluate import EvalConfig, evaluate_many
from ..models.registry import get_eval_pool
from ..utils.logging import MetricLogger
from .common import load_data


def main(argv=None):
    from ..parallel.mesh import ensure_platform_env

    ensure_platform_env()  # honor JAX_PLATFORMS despite the axon config pin
    p = argparse.ArgumentParser(description="Coreset baselines")
    p.add_argument("--dataset", default="miniUCF101")
    p.add_argument("--method", default="k-center",
                   choices=["k-center", "herding"])
    p.add_argument("--model", default="ConvNet3D")
    p.add_argument("--ipc", type=int, default=1)
    p.add_argument("--eval_mode", default="S")
    p.add_argument("--num_eval", type=int, default=5)
    p.add_argument("--epoch_eval_train", type=int, default=1000)
    p.add_argument("--lr_net", type=float, default=0.001)
    p.add_argument("--batch_train", type=int, default=256)
    p.add_argument("--data_path", default="data")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = DistillConfig(dataset=args.dataset, model=args.model,
                        ipc=args.ipc, data_path=args.data_path,
                        frames=args.frames, seed=args.seed)
    data = load_data(cfg)
    logger = MetricLogger(run_name=f"coreset_{args.method}_{args.dataset}")
    key = jax.random.PRNGKey(args.seed)

    syn, labels = select_coreset(key, data.train, args.model, args.ipc,
                                 args.method, args.frames)
    test_rng = np.random.default_rng(args.seed + 123)
    for model_eval in get_eval_pool(args.eval_mode, args.model):
        ecfg = EvalConfig(model=model_eval,
                          epoch_eval_train=args.epoch_eval_train,
                          lr_net=args.lr_net, batch_train=args.batch_train,
                          eval_mode=args.eval_mode)
        _, mean, std = evaluate_many(key, args.num_eval, syn, labels, data,
                                     ecfg, test_rng)
        logger.log({f"Accuracy/{model_eval}": mean,
                    f"Std/{model_eval}": std})
    logger.finish()


if __name__ == "__main__":
    main()
