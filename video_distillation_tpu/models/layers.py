"""Shared building blocks for the model zoo.

The reference model zoo (``/root/reference/networks.py``) relies on PyTorch's
default layer initialisation: Conv/Linear weights and biases are drawn from
``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` (kaiming_uniform with a=sqrt(5)).
Distillation dynamics (DM feature statistics, MTT trajectory geometry) are
sensitive to the init distribution, so we reproduce it here instead of using
flax's lecun_normal default.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_kaiming_uniform(dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) over the kernel.

    flax conv kernels are shaped (*spatial, in_features, out_features); dense
    kernels are (in_features, out_features). fan_in = prod(shape[:-1]).
    """

    def init(key, shape, dtype=dtype):
        fan_in = 1
        for d in shape[:-1]:
            fan_in *= d
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_uniform(fan_in: int, dtype=jnp.float32):
    """Torch draws biases from U(-1/sqrt(fan_in), 1/sqrt(fan_in)) as well."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchConv(nn.Module):
    """nn.Conv with torch-default init (weight AND bias from fan_in bound)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: Any = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1] // self.feature_group_count
        fan_in = in_features * math.prod(self.kernel_size)
        return nn.Conv(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=None if self.strides is None else tuple(self.strides),
            padding=self.padding,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_init=torch_kaiming_uniform(),
            bias_init=torch_bias_uniform(fan_in),
        )(x)


class TemporalIm2ColConv(nn.Module):
    """Conv3d k=(3,7,7) s=(1,2,2) p=(1,3,3) expressed as a temporal im2col
    (stack the t-1/t/t+1 frames into channels) followed by a 2-D conv.

    Mathematically identical to the direct 3-D convolution (same dot
    products, same torch-default init); on TPU the 3-D backward for a
    3-channel first layer is ~3x slower than this 2-D formulation (XLA's
    conv3d dgrad/wgrad tile poorly at C_in=3), so ConvNet3D's first layer
    uses this. Kernel is stored in DHWIO layout like nn.Conv's so weight
    ports from the torch reference transpose identically.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        # x: (B, F, H, W, C)
        B, F, H, W, C = x.shape
        fan_in = C * 3 * 7 * 7
        kernel = self.param("kernel", torch_kaiming_uniform(),
                            (3, 7, 7, C, self.features))
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xs = jnp.concatenate(
            [xp[:, 0:F], xp[:, 1:F + 1], xp[:, 2:F + 2]], axis=-1)
        xf = xs.reshape(B * F, H, W, 3 * C)
        # (3,7,7,C,O) -> (7,7,3*C,O): channel index = t_offset*C + c
        w2 = kernel.transpose(1, 2, 0, 3, 4).reshape(7, 7, 3 * C,
                                                     self.features)
        y = jax.lax.conv_general_dilated(
            xf, w2.astype(xf.dtype), window_strides=(2, 2),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", torch_bias_uniform(fan_in),
                              (self.features,))
            y = y + bias.astype(y.dtype)
        return y.reshape(B, F, y.shape[1], y.shape[2], self.features)


class TorchDense(nn.Module):
    """nn.Dense with torch-default init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kaiming_uniform(),
            bias_init=torch_bias_uniform(fan_in),
        )(x)


def activation(name: str):
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "relu":
        return jax.nn.relu
    if name == "leakyrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.01)
    if name == "swish":
        # reference Swish is x * sigmoid(x) (networks.py:12-18)
        return jax.nn.silu
    raise ValueError(f"unknown activation function: {name}")


def max_pool(x, window: Sequence[int], strides: Sequence[int] | None = None):
    """VALID max-pool over the spatial dims of channels-last x (matches
    torch's floor-division output shape)."""
    strides = strides or window
    return nn.max_pool(x, tuple(window), strides=tuple(strides), padding="VALID")


def avg_pool(x, window: Sequence[int], strides: Sequence[int] | None = None):
    strides = strides or window
    return nn.avg_pool(x, tuple(window), strides=tuple(strides), padding="VALID")


def norm_layer(net_norm: str, *, channels: int, spatial_rank: int,
               train: bool = True):
    """Map the reference norm names to flax modules.

    The reference 'instancenorm' is GroupNorm(num_groups=C) and 'groupnorm'
    is GroupNorm(4) (networks.py:778-790, :86-97). BatchNorm follows torch
    semantics: batch statistics (+ running-average update, when the caller
    applies with ``mutable=['batch_stats']``) in train mode, running
    statistics in eval mode.
    """
    if net_norm == "none":
        return None
    if net_norm == "instancenorm":
        return nn.GroupNorm(num_groups=channels)
    if net_norm == "groupnorm":
        return nn.GroupNorm(num_groups=4)
    if net_norm == "layernorm":
        # torch LayerNorm over (C, *spatial); our layout is (*spatial, C) —
        # normalise over all non-batch axes, matching the same statistic set.
        return nn.LayerNorm(reduction_axes=tuple(range(-1 - spatial_rank, 0)))
    if net_norm == "batchnorm":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5)
    raise ValueError(f"unknown net_norm: {net_norm}")


def flatten(x):
    return x.reshape((x.shape[0], -1))
