"""Shared driver plumbing: data loading, the eval-and-track loop.

Mirrors the bookkeeping every reference driver repeats
(``/root/reference/distill_baseline.py:146-189`` etc.): evaluate num_eval
fresh nets per model in the eval pool, track best mean accuracy, save
artifacts on new bests.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..config import DistillConfig, get_preset
from ..data import load_packed, make_synthetic_video_data
from ..data.store import VideoData
from ..distill.evaluate import EvalConfig, evaluate_many
from ..models.registry import get_eval_pool
from ..utils.logging import MetricLogger


def parse_config_args(description: str, argv=None,
                      default_preset: Optional[str] = None) -> DistillConfig:
    """Field-driven CLI over DistillConfig: --preset picks the named config,
    any --<field> overrides it (mirrors the reference sh/ wrappers passing
    "$@" through to argparse). Unknown flags are argparse errors, never
    silently dropped."""
    from ..parallel import init_distributed
    from ..parallel.mesh import ensure_platform_env

    # honor JAX_PLATFORMS even under the axon bootstrap's config pin
    # (see parallel/mesh.py ensure_platform_env), then extend the mesh
    # over DCN before any other jax use — both silent no-ops normally
    ensure_platform_env()
    init_distributed()

    p = argparse.ArgumentParser(description=description)
    p.add_argument("--preset", type=str, default=default_preset)
    for f in dataclasses.fields(DistillConfig):
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(f"--{f.name}", type=lambda s: s.lower() == "true",
                           default=None)
        elif f.name != "mesh_shape":
            p.add_argument(f"--{f.name}",
                           type=type(f.default) if f.default is not None
                           else str, default=None)
    args = p.parse_args(argv)
    cfg = get_preset(args.preset) if args.preset else DistillConfig()
    for f in dataclasses.fields(DistillConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            setattr(cfg, f.name, v)
    return cfg


def load_data(cfg) -> VideoData:
    """Packed store if available, else an error with packing instructions;
    dataset names starting with 'synthetic' build a random set (tests,
    benches). Reconciles cfg.frames with the store's clip length (the
    reference requires a matching --frames flag and fails obscurely
    otherwise)."""
    name = cfg.dataset
    if name.startswith("synthetic"):
        from ..data.synthetic import synthetic_kwargs_from_name
        data = make_synthetic_video_data(name=name,
                                         **synthetic_kwargs_from_name(name))
    else:
        packed = cfg.packed_path or os.path.join(cfg.data_path,
                                                 f"{name}_packed")
        if os.path.isdir(packed):
            data = load_packed(packed)
        else:
            raise FileNotFoundError(
                f"No packed store at {packed}. Run: python -m "
                f"video_distillation_tpu.drivers.pack --dataset {name} "
                f"--data_path {cfg.data_path} --out "
                f"{os.path.dirname(packed)}")
    if getattr(cfg, "frames", None) not in (None, data.meta.frames):
        print(f"[load_data] --frames {cfg.frames} != dataset frames "
              f"{data.meta.frames}; using {data.meta.frames}")
        cfg.frames = data.meta.frames
    return data


class EvalTracker:
    """best_acc/best_std per eval model + artifact saving on new best."""

    def __init__(self, cfg: DistillConfig, data: VideoData,
                 logger: MetricLogger, save_dir: str,
                 save_fn: Optional[Callable] = None):
        self.cfg = cfg
        self.data = data
        self.logger = logger
        self.save_dir = save_dir
        self.save_fn = save_fn
        self.pool = get_eval_pool(cfg.eval_mode, cfg.model)
        self.best_acc: Dict[str, float] = {m: 0.0 for m in self.pool}
        self.best_std: Dict[str, float] = {m: 0.0 for m in self.pool}
        self.test_rng = np.random.default_rng(cfg.seed + 123)

    def should_eval(self, it: int) -> bool:
        cfg = self.cfg
        return it in range(cfg.startIt, cfg.Iteration + 1, cfg.eval_it)

    def maybe_eval(self, it: int, key, syn_images, syn_labels, lr_net,
                   s2d_cfg=None, s2d_state=None) -> bool:
        cfg = self.cfg
        if not self.should_eval(it):
            return False
        lr_net = float(lr_net)
        save_best = False
        for model_eval in self.pool:
            ecfg = EvalConfig(
                model=model_eval,
                epoch_eval_train=cfg.epoch_eval_train,
                lr_net=float(lr_net), batch_train=cfg.batch_train,
                eval_mode=cfg.eval_mode,
                mode="multi-static" if s2d_state is not None else "none")
            _, mean, std = evaluate_many(
                jax.random.fold_in(key, it), cfg.num_eval, syn_images,
                syn_labels, self.data, ecfg, self.test_rng,
                s2d_cfg=s2d_cfg, s2d_state=s2d_state,
                vmap_eval=getattr(cfg, "vmap_eval", False))
            if mean > self.best_acc[model_eval]:
                self.best_acc[model_eval] = mean
                self.best_std[model_eval] = std
                save_best = True
            self.logger.log({
                f"Accuracy/{model_eval}": mean,
                f"Max_Accuracy/{model_eval}": self.best_acc[model_eval],
                f"Std/{model_eval}": std,
                f"Max_Std/{model_eval}": self.best_std[model_eval],
            }, step=it)
        if (save_best or it % 1000 == 0) and self.save_fn is not None:
            self.save_fn(it, save_best)
        return save_best
