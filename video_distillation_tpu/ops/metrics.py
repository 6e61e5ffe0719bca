"""Accuracy metrics matching the reference's ``epoch`` bookkeeping
(``/root/reference/utils.py:752-844``): top-1/3/5 and per-class accuracy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_correct(logits, labels, ks=(1, 3, 5)):
    """Returns {k: correct_count} summed over the batch (float32)."""
    max_k = min(max(ks), logits.shape[-1])
    _, pred = jax.lax.top_k(logits, k=max_k)
    hits = pred == labels[:, None]  # (B, max_k)
    out = {}
    for k in ks:
        kk = min(k, max_k)
        out[k] = hits[:, :kk].any(axis=1).sum().astype(jnp.float32)
    return out


def per_class_correct(logits, labels, num_classes: int, weights=None):
    """(correct_per_class, count_per_class), each (C,).

    ``weights`` masks out padded rows (0/1 per sample).
    """
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if weights is not None:
        correct = correct * weights
        ones = weights.astype(jnp.float32)
    else:
        ones = jnp.ones_like(correct)
    corr = jax.ops.segment_sum(correct, labels, num_segments=num_classes)
    cnt = jax.ops.segment_sum(ones, labels, num_segments=num_classes)
    return corr, cnt
