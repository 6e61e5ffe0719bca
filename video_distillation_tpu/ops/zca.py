"""ZCA whitening — the FRePo image-preprocessing pipeline.

Parity with ``/root/reference/FRePo/lib/dataset/ops.py``: streaming
mean/covariance over the train set (:83-139), regularised eigen-whitening
transform and its inverse (:175-226), and forward/reverse preprocess ops
(:229-284). Implemented as dense JAX ops (the covariance eigendecomposition
is a one-time fp64->fp32 host-side cost; application is one matmul — pure
MXU work).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ZCAState:
    mean: np.ndarray        # (D,)
    whiten: np.ndarray      # (D, D)
    dewhiten: np.ndarray    # (D, D)
    shape: Tuple[int, ...]  # per-sample shape


def fit_zca(x: np.ndarray, reg: float = 0.1,
            batch: int = 4096) -> ZCAState:
    """Fit on (N, ...) float images (already scaled to [0,1] or
    normalised); streaming accumulation keeps memory flat."""
    n = x.shape[0]
    d = int(np.prod(x.shape[1:]))
    mean = np.zeros(d, np.float64)
    for i in range(0, n, batch):
        mean += x[i:i + batch].reshape(-1, d).sum(axis=0)
    mean /= n
    cov = np.zeros((d, d), np.float64)
    for i in range(0, n, batch):
        xb = x[i:i + batch].reshape(-1, d) - mean
        cov += xb.T @ xb
    cov /= n
    eigval, eigvec = np.linalg.eigh(cov)
    eigval = np.maximum(eigval, 0.0)
    # regularisation as in ops.py: reg * average eigenvalue
    lam = reg * eigval.mean()
    inv_sqrt = 1.0 / np.sqrt(eigval + lam)
    sqrt = np.sqrt(eigval + lam)
    whiten = (eigvec * inv_sqrt) @ eigvec.T
    dewhiten = (eigvec * sqrt) @ eigvec.T
    return ZCAState(mean=mean.astype(np.float32),
                    whiten=whiten.astype(np.float32),
                    dewhiten=dewhiten.astype(np.float32),
                    shape=tuple(x.shape[1:]))


def apply_zca(state: ZCAState, x):
    flat = x.reshape(x.shape[0], -1) - state.mean
    out = flat @ jnp.asarray(state.whiten).T
    return out.reshape((x.shape[0],) + state.shape)


def invert_zca(state: ZCAState, x):
    flat = x.reshape(x.shape[0], -1)
    out = flat @ jnp.asarray(state.dewhiten).T + state.mean
    return out.reshape((x.shape[0],) + state.shape)
