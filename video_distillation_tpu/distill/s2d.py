"""S2D static/dynamic synthetic parameterization + slot sampling rules.

The paper's contribution: synthetic data is factored into per-class static
RGB stills ``(C*spc, H, W, 3)``, dynamic 1-channel motion volumes
``(C, dpc, F, H, W, 1)`` and a list of tiny hallucinator networks that
compose them into videos.

Slot-coupling parity:
* distillation-time indexing — ``/root/reference/distill_s2d_ms.py:240-247``
  (MTT) and ``:402-407`` (DM): for flat sample i of class ``label = i//vpc``
  and ``idx = i%vpc``: ``dynamic_idx = 2*idx + U{0,1}``,
  ``static_idx = spc*label + 2*idx + U{0,1}``, hal_idx = 0.
* evaluation-time indexing — ``MultiStaticSharedDataset``
  (``utils.py:462-496``): spc==10 uses the same coupled scheme (vpc=5);
  spc==2 draws a random static of the class and a random dynamic (vpc=1);
  the hallucinator is drawn uniformly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp

from ..models.hallucinator import Hallucinator


@dataclasses.dataclass
class S2DConfig:
    num_classes: int
    spc: int = 2    # statics per class
    dpc: int = 2    # dynamics per class
    vpc: int = 1    # videos per class (synthetic set size / C)
    n_hal: int = 1
    frames: int = 16
    im_size: Tuple[int, int] = (112, 112)
    hal_mode: str = "concat"


def init_s2d_state(key, cfg: S2DConfig):
    """Random-normal memories + initialised hallucinators
    (distill_s2d_ms.py:89-93)."""
    k_s, k_d, k_h = jax.random.split(key, 3)
    h, w = cfg.im_size
    static = jax.random.normal(k_s, (cfg.num_classes * cfg.spc, h, w, 3))
    dynamic = jax.random.normal(
        k_d, (cfg.num_classes, cfg.dpc, cfg.frames, h, w, 1))
    hal_def = Hallucinator(mode=cfg.hal_mode)
    hal_params = []
    for i in range(cfg.n_hal):
        k_h, k = jax.random.split(k_h)
        hal_params.append(hal_def.init(
            k, jnp.zeros((1, h, w, 3)), jnp.zeros((1, cfg.frames, h, w, 1))
        )["params"])
    return {"static": static, "dynamic": dynamic, "hals": hal_params}


def hallucinate(hal_params, static, dynamic, mode: str = "concat",
                dtype=None):
    """Compose videos: static (B,H,W,3) + dynamic (B,F,H,W,1) ->
    (B,F,H,W,3).

    ``dtype`` (e.g. bfloat16) casts inputs and kernel for the compose:
    the 4->3-channel stencil conv is bandwidth-bound and runs ~2x faster
    in bf16; grads flow back through the casts into the fp32 master
    state. On TPU the 'concat' composition routes to the differentiable
    Pallas primitive (ops/pallas/hal_vjp.py) — XLA's 4->3-channel conv
    emitters run at 1.7-7 TF/s with heavy layout copies."""
    if dtype is not None:
        hal_params = jax.tree.map(lambda a: a.astype(dtype), hal_params)
        static = static.astype(dtype)
        dynamic = dynamic.astype(dtype)
    import os
    if (mode == "concat" and jax.default_backend() == "tpu"
            and not os.environ.get("VD_DISABLE_PALLAS_HAL")):
        from ..ops.pallas.hal_vjp import hal_conv_from_params

        return hal_conv_from_params(hal_params, static, dynamic)
    return Hallucinator(mode=mode).apply({"params": hal_params}, static,
                                         dynamic)


def distill_slots(key, num_classes: int, spc: int, vpc: int, n: int,
                  sample_idx):
    """Distillation-time slot sampling for flat sample indices.

    sample_idx: (n,) flat indices in [0, num_classes*vpc).
    Returns (label, static_idx, dynamic_idx) — hal_idx is fixed 0
    (distill_s2d_ms.py:247).
    """
    k1, k2 = jax.random.split(key)
    label = sample_idx // vpc
    idx = sample_idx % vpc
    dynamic_idx = 2 * idx + jax.random.randint(k1, (n,), 0, 2)
    static_idx = spc * label + 2 * idx + jax.random.randint(k2, (n,), 0, 2)
    return label, static_idx, dynamic_idx


def eval_slots(key, num_classes: int, spc: int, dpc: int, n_hal: int):
    """Evaluation-time slot sampling over the whole synthetic set
    (utils.py:469-488). Returns (label, static_idx, dynamic_idx, hal_idx)
    each of length num_classes*vpc where vpc = 5 if spc==10 else 1."""
    if spc == 10:
        vpc = 5
    elif spc == 2:
        vpc = 1
    else:
        raise ValueError(
            "MultiStaticSharedDataset supports spc in {2, 10} "
            f"(got {spc}) — utils.py:471-482")
    n = num_classes * vpc
    i = jnp.arange(n)
    k1, k2, k3 = jax.random.split(key, 3)
    if vpc == 5:
        label = i // 5
        idx = i % 5
        static_idx = label * spc + 2 * idx + jax.random.randint(k1, (n,), 0, 2)
        dynamic_idx = 2 * idx + jax.random.randint(k2, (n,), 0, 2)
    else:
        label = i
        static_idx = label * spc + jax.random.randint(k1, (n,), 0, spc)
        dynamic_idx = jax.random.randint(k2, (n,), 0, dpc)
    hal_idx = jax.random.randint(k3, (n,), 0, n_hal)
    return label, static_idx, dynamic_idx, hal_idx


def compose_synthetic(key, state, cfg: S2DConfig, for_eval: bool = True):
    """Compose the full synthetic set -> (videos (C*vpc,F,H,W,3),
    labels (C*vpc,)).

    ``for_eval`` uses the MultiStaticSharedDataset rules; otherwise the
    distillation-time DM rules (distill_s2d_ms.py:402-412).
    """
    if for_eval:
        label, s_idx, d_idx, h_idx = eval_slots(
            key, cfg.num_classes, cfg.spc, cfg.dpc, cfg.n_hal)
    else:
        n = cfg.num_classes * cfg.vpc
        label, s_idx, d_idx = distill_slots(
            key, cfg.num_classes, cfg.spc, cfg.vpc, n, jnp.arange(n))
        h_idx = jnp.zeros((n,), jnp.int32)

    static = state["static"][s_idx]
    dynamic = state["dynamic"][label, d_idx]
    if cfg.n_hal == 1:
        videos = hallucinate(state["hals"][0], static, dynamic, cfg.hal_mode)
    else:
        # compose with each hallucinator, select per-sample (tiny nets; the
        # n_hal-fold compute is negligible and stays jit-friendly)
        outs = jnp.stack([
            hallucinate(p, static, dynamic, cfg.hal_mode)
            for p in state["hals"]
        ])
        videos = outs[h_idx, jnp.arange(static.shape[0])]
    return videos, label
