"""Per-frame 2D ConvNet video models with temporal aggregation heads.

Parity with ``/root/reference/networks.py:537-722``: a 2D ConvNet backbone is
applied per frame; features are aggregated over time by
mean (VideoConvNetMean :537), a learned per-feature temporal linear map
(VideoConvNetMLP :626), or a single-layer LSTM/RNN/GRU whose outputs are
mean-pooled (:649-722; RNN/GRU use hidden = num_feat // 8).

Input layout: ``(B, F, H, W, C)``. The recurrent cells reproduce torch's
gate equations and its U(-1/sqrt(hidden), 1/sqrt(hidden)) init, but run as a
``lax.scan`` over time (compiler-friendly; no cuDNN analog needed).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .convnet2d import ConvNet2D
from .layers import TorchDense, flatten


def _uniform(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _Recurrent(nn.Module):
    """Single-layer torch-equivalent RNN/LSTM/GRU over (B, T, D) inputs."""

    hidden: int
    cell: str  # 'rnn' | 'lstm' | 'gru'

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        h = self.hidden
        n_gates = {"rnn": 1, "lstm": 4, "gru": 3}[self.cell]
        bound = 1.0 / math.sqrt(h)
        w_ih = self.param("w_ih", _uniform(bound), (d, n_gates * h))
        w_hh = self.param("w_hh", _uniform(bound), (h, n_gates * h))
        b_ih = self.param("b_ih", _uniform(bound), (n_gates * h,))
        b_hh = self.param("b_hh", _uniform(bound), (n_gates * h,))

        # Hoist the input projection out of the scan: one big MXU matmul.
        x_proj = jnp.einsum("btd,dg->btg", x, w_ih) + b_ih

        def step_rnn(carry, xp):
            (h_prev,) = carry
            h_new = jnp.tanh(xp + h_prev @ w_hh + b_hh)
            return (h_new,), h_new

        def step_lstm(carry, xp):
            h_prev, c_prev = carry
            gates = xp + h_prev @ w_hh + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = f * c_prev + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        def step_gru(carry, xp):
            (h_prev,) = carry
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(h_prev @ w_hh + b_hh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h_prev
            return (h_new,), h_new

        h0 = jnp.zeros((b, h), x.dtype)
        if self.cell == "lstm":
            carry0 = (h0, jnp.zeros((b, h), x.dtype))
            step = step_lstm
        elif self.cell == "gru":
            carry0, step = (h0,), step_gru
        else:
            carry0, step = (h0,), step_rnn

        xs = jnp.swapaxes(x_proj, 0, 1)  # (T, B, G)
        _, ys = jax.lax.scan(step, carry0, xs)
        return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


class VideoConvNet(nn.Module):
    channel: int = 3
    num_classes: int = 10
    net_width: int = 128
    net_depth: int = 3
    net_act: str = "relu"
    net_norm: str = "instancenorm"
    net_pooling: str = "avgpooling"
    im_size: Tuple[int, int] = (64, 64)
    head: str = "mean"  # 'mean' | 'mlp' | 'lstm' | 'rnn' | 'gru'

    def _frame_features(self, x, train):
        b, f = x.shape[:2]
        frames = x.reshape((b * f,) + x.shape[2:])
        feat = ConvNet2D(
            channel=self.channel,
            num_classes=self.num_classes,
            net_width=self.net_width,
            net_depth=self.net_depth,
            net_act=self.net_act,
            net_norm=self.net_norm,
            net_pooling=self.net_pooling,
            im_size=self.im_size,
        )(frames, train=train, output="feat")
        return feat.reshape(b, f, -1)

    @nn.compact
    def __call__(self, x, train: bool = True, output: str = "logits"):
        out = self._frame_features(x, train)  # (B, F, D)
        b, f, d = out.shape
        if self.head == "mean":
            feat = out.mean(axis=1)
        elif self.head == "mlp":
            # learned per-feature temporal weights (networks.py:630-644)
            w = self.param("temporal_weight", nn.initializers.normal(1.0), (d, f, 1))
            bias = self.param("temporal_bias", nn.initializers.normal(1.0), (d, 1))
            # (D,B,F) @ (D,F,1) -> (D,B,1)
            feat = (jnp.einsum("bfd,dfi->dbi", out, w) + bias[:, None, :]).squeeze(-1).T
        elif self.head in ("lstm", "rnn", "gru"):
            hidden = d if self.head == "lstm" else d // 8
            ys = _Recurrent(hidden=hidden, cell=self.head)(out)
            feat = ys.mean(axis=1)
        else:
            raise ValueError(f"unknown temporal head: {self.head}")
        if output == "feat":
            return feat
        logits = TorchDense(self.num_classes)(feat)
        if output == "both":
            return logits, feat
        return logits
