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
