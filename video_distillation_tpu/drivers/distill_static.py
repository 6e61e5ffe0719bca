"""Static-memory learning driver: DC gradient matching on single-frame
datasets.

The reference delegates this step to the external DC repo, providing only
the ``single*`` dataset loaders (``README.md`` "Static Learning";
``distill_utils/dataset.py:18-77,897-946``). Here it is first-class: learn
``spc`` static images per class with DC on a single-frame store, then feed
the result to S2D via ``--path_static``.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DistillConfig
from ..data.store import ClipStore
from ..distill.dc import make_dc_trainer
from ..distill.dm import init_synthetic_raw
from ..utils.checkpoint import save_artifact
from ..utils.logging import MetricLogger
from .common import load_data


def to_single_frame_store(store: ClipStore,
                          rng: np.random.Generator) -> ClipStore:
    """Derive a single-frame (image) store from a video clip store — the
    reference's single* datasets return one random frame per clip
    (dataset.py:69-77)."""
    import dataclasses as dc
    n, f = store.clips.shape[:2]
    pick = rng.integers(0, f, size=n)
    frames = store.clips[np.arange(n), pick]
    meta = dc.replace(store.meta, name=f"single_{store.meta.name}", frames=1)
    return ClipStore(frames, store.labels.copy(), meta)


def main(argv=None):
    from ..parallel.mesh import ensure_platform_env

    ensure_platform_env()  # honor JAX_PLATFORMS despite the axon config pin
    p = argparse.ArgumentParser(description="DC static-memory learning")
    p.add_argument("--dataset", default="miniUCF101")
    p.add_argument("--model", default="ConvNet")
    p.add_argument("--spc", type=int, default=2,
                   help="static images per class to learn")
    p.add_argument("--lr_img", type=float, default=0.1)
    p.add_argument("--lr_net", type=float, default=0.01)
    p.add_argument("--batch_real", type=int, default=64)
    p.add_argument("--Iteration", type=int, default=1000)
    p.add_argument("--dis_metric", default="ours")
    p.add_argument("--data_path", default="data")
    p.add_argument("--save_path", default="./logged_files/static")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = DistillConfig(dataset=args.dataset, data_path=args.data_path)
    data = load_data(cfg)
    rng = np.random.default_rng(args.seed)
    singles = to_single_frame_store(data.train, rng)

    key = jax.random.PRNGKey(args.seed)
    syn, labels = init_synthetic_raw(key, singles, args.spc, 1, "real", rng)
    syn = syn.reshape((syn.shape[0],) + syn.shape[2:])  # drop frame dim
    mom = jnp.zeros_like(syn)

    trainer = make_dc_trainer(singles, args.model, args.spc,
                              args.batch_real, args.lr_img, args.lr_net,
                              args.dis_metric)
    logger = MetricLogger(run_name=f"static_{args.dataset}")
    for it in range(args.Iteration + 1):
        syn, mom, loss = trainer(jax.random.fold_in(key, it), syn, labels,
                                 mom, rng)
        if it % 100 == 0:
            logger.log({"Loss": loss}, step=it)
    save_artifact(args.save_path, f"static_{args.dataset}_spc{args.spc}",
                  syn)
    logger.finish()
    print(f"static memory saved to {args.save_path}")


if __name__ == "__main__":
    main()
