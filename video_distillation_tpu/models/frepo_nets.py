"""FRePo eval-pool image nets: KIP_ConvNet and Conv.

Capability equivalents of ``/root/reference/FRePo/lib/models/networks.py``
``KIP_ConvNet`` (:88-182) and ``Conv`` (:185-237), exposed through the
shared zoo interface (NHWC input, ``output`` in {'logits','feat','both'},
``train`` flag). KIP_ConvNet uses the KIP-paper init (lecun_normal kernels,
N(0, 0.1) biases); Conv doubles its width per block.
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.linen as nn

from .layers import activation


def _frepo_norm(normalization: str, train: bool):
    if normalization in ("identity", "none"):
        return None
    if normalization == "batch":
        return nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                            momentum=0.1)
    if normalization == "layer":
        return nn.LayerNorm()
    if normalization == "group":
        return nn.GroupNorm()
    if normalization == "group1":
        return nn.GroupNorm(num_groups=1)
    if normalization == "instance":
        return nn.GroupNorm(num_groups=None, group_size=1)
    raise ValueError(f"unknown normalization: {normalization}")


class KIPConvNet(nn.Module):
    """KIP_ConvNet (networks.py:88-182): a stem conv + depth blocks of
    [norm?, conv, act, pool]; features = flattened (or GAP'd) block stack."""

    num_classes: int = 10
    width: int = 128
    depth: int = 3
    kernel_size: Tuple[int, int] = (3, 3)
    net_act: str = "relu"
    normalization: str = "identity"
    pooling: str = "avg"
    use_gap: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, output: str = "logits"):
        act = activation(self.net_act)
        kinit = nn.initializers.lecun_normal()
        binit = nn.initializers.normal(stddev=0.1)
        conv = functools.partial(nn.Conv, features=self.width,
                                 kernel_size=self.kernel_size,
                                 kernel_init=kinit, use_bias=True)
        pool = {"avg": nn.avg_pool, "max": nn.max_pool,
                "identity": lambda v, *a, **k: v}[self.pooling]

        x = conv()(x)
        x = act(x)
        for _ in range(self.depth):
            norm = _frepo_norm(self.normalization, train)
            if norm is not None:
                x = norm(x)
            x = conv()(x)
            x = act(x)
            x = pool(x, (2, 2), strides=(2, 2))

        if self.use_gap:
            x = nn.avg_pool(x, x.shape[1:3])
        feat = x.reshape((x.shape[0], -1))
        if output == "feat":
            return feat
        logits = nn.Dense(self.num_classes, kernel_init=kinit,
                          bias_init=binit)(feat)
        if output == "both":
            return logits, feat
        return logits


class FRePoConv(nn.Module):
    """Conv (networks.py:185-237): width doubles per block; 1-channel
    inputs get k//2+2 padding on the first conv."""

    num_classes: int = 10
    width: int = 128
    depth: int = 3
    kernel_size: Tuple[int, int] = (3, 3)
    normalization: str = "identity"

    @nn.compact
    def __call__(self, x, train: bool = True, output: str = "logits"):
        channel = x.shape[-1]
        for i in range(self.depth):
            if i != 0:
                norm = _frepo_norm(self.normalization, train)
                if norm is not None:
                    x = norm(x)
            k = self.kernel_size[0] // 2
            pad = k + 2 if (i == 0 and channel == 1) else k
            x = nn.Conv(features=self.width * (2 ** i),
                        kernel_size=self.kernel_size,
                        padding=((pad, pad), (pad, pad)),
                        use_bias=True)(x)
            x = nn.relu(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        feat = x.reshape((x.shape[0], -1))
        if output == "feat":
            return feat
        logits = nn.Dense(self.num_classes)(feat)
        if output == "both":
            return logits, feat
        return logits
