"""Losses used across the distillation families.

Parity sources:
* cross-entropy — torch ``nn.CrossEntropyLoss`` (mean over batch)
* DC gradient-matching distances — ``/root/reference/utils.py:634-687``
  (``distance_wb`` layerwise cosine, ``match_loss`` with 'ours'/'mse'/'cos')
* MTT normalized parameter loss — ``distill_baseline.py:255-272``
* FRePo label-margin regulariser — ``FRePo/lib/datadistillation/frepo.py:152-157``
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels):
    """Mean softmax cross-entropy with integer labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def soft_cross_entropy(logits, target_probs):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -(target_probs * logp).sum(-1).mean()


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def mtt_param_loss(theta_final, theta_start, theta_target):
    """‖θ_K − θ*‖² / ‖θ_0 − θ*‖² over flat param vectors
    (distill_baseline.py:255-272; the /num_params factors cancel)."""
    param_loss = jnp.sum((theta_final - theta_target) ** 2)
    param_dist = jnp.sum((theta_start - theta_target) ** 2)
    return param_loss / param_dist, param_loss, param_dist


def _rows_out_first(g):
    """Flatten a kernel to (out_features, fan_in) rows.

    torch weights are (out, in, *k) and distance_wb groups by output
    channel (utils.py:636-642); flax kernels are (*k, in, out), so the
    LAST axis is the output one — move it to the front.
    """
    return jnp.moveaxis(g, -1, 0).reshape(g.shape[-1], -1)


def _safe_norm(x, axis):
    # sqrt has an infinite gradient at 0; a grad-row can be exactly zero
    # (dead feature), so smooth the norm instead of special-casing.
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-12)


def _distance_wb(gwr, gws):
    """Layerwise cosine distance (utils.py:634-651). 1-D tensors (biases,
    norm scales) contribute 0."""
    if gwr.ndim == 1:
        return jnp.asarray(0.0, gwr.dtype)
    gwr = _rows_out_first(gwr)
    gws = _rows_out_first(gws)
    num = jnp.sum(gwr * gws, axis=-1)
    den = _safe_norm(gwr, -1) * _safe_norm(gws, -1) + 1e-6
    return jnp.sum(1.0 - num / den)


def match_loss(gw_syn, gw_real, dis_metric: str = "ours"):
    """DC gradient-matching distance over two gradient pytrees
    (utils.py:655-687)."""
    syn_leaves = jax.tree.leaves(gw_syn)
    real_leaves = jax.tree.leaves(gw_real)
    if dis_metric == "ours":
        return sum(_distance_wb(gr, gs)
                   for gr, gs in zip(real_leaves, syn_leaves))
    if dis_metric == "mse":
        vr = jnp.concatenate([g.reshape(-1) for g in real_leaves])
        vs = jnp.concatenate([g.reshape(-1) for g in syn_leaves])
        return jnp.sum((vs - vr) ** 2)
    if dis_metric == "cos":
        vr = jnp.concatenate([g.reshape(-1) for g in real_leaves])
        vs = jnp.concatenate([g.reshape(-1) for g in syn_leaves])
        return 1.0 - jnp.sum(vr * vs) / (
            jnp.linalg.norm(vr) * jnp.linalg.norm(vs) + 1e-6)
    raise ValueError(f"unknown distance function: {dis_metric}")


def lb_margin_th(logits):
    """FRePo label-margin: -min(top1 - top2, 1/dim) per row
    (frepo.py:152-157)."""
    dim = logits.shape[-1]
    val = jax.lax.top_k(logits, k=2)[0]
    margin = jnp.minimum(val[..., 0] - val[..., 1], 1.0 / dim)
    return -margin


def dm_loss(feat_real, feat_syn, num_classes: int):
    """Distribution-matching loss, batched over classes.

    feat_real: (C, B_r, D); feat_syn: (C, ipc, D). Equals the reference's
    per-class python loop sum of squared mean differences
    (distill_baseline.py:344-351) computed as one vectorised reduction.
    """
    mean_real = feat_real.mean(axis=1)
    mean_syn = feat_syn.mean(axis=1)
    return jnp.sum((mean_real - mean_syn) ** 2)
