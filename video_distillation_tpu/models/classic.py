"""Classic eval-pool architectures: MLP, LeNet, AlexNet(BN), VGG, ResNet.

Structural parity with ``/root/reference/networks.py``:
MLP :21-39, LeNet :119-140, AlexNet :145-174, AlexNetBN :178-212,
VGG :216-264, ResNet :383-500, ResNet_AP :267-380.
All are image models with input layout ``(B, H, W, C)``; every net exposes
the flattened penultimate features via ``output='feat'`` (the reference's
``embed``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import TorchConv, TorchDense, avg_pool, flatten, max_pool


def _norm(norm: str, channels: int, train: bool = True):
    if norm == "instancenorm":
        return nn.GroupNorm(num_groups=channels)
    if norm == "batchnorm":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5)
    raise ValueError(norm)


class MLP(nn.Module):
    channel: int = 3
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = True, output: str = "logits"):
        out = flatten(x)
        out = nn.relu(TorchDense(128)(out))
        out = nn.relu(TorchDense(128)(out))
        feat = out
        if output == "feat":
            return feat
        logits = TorchDense(self.num_classes)(feat)
        if output == "both":
            return logits, feat
        return logits


class LeNet(nn.Module):
    channel: int = 3
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = True, output: str = "logits"):
        pad = 2 if self.channel == 1 else 0
        x = TorchConv(6, (5, 5), padding=((pad, pad), (pad, pad)))(x)
        x = nn.relu(x)
        x = max_pool(x, (2, 2))
        x = TorchConv(16, (5, 5), padding="VALID")(x)
        x = nn.relu(x)
        x = max_pool(x, (2, 2))
        x = flatten(x)
        x = nn.relu(TorchDense(120)(x))
        x = nn.relu(TorchDense(84)(x))
        feat = x
        if output == "feat":
            return feat
        logits = TorchDense(self.num_classes)(feat)
        if output == "both":
            return logits, feat
        return logits


class AlexNet(nn.Module):
    channel: int = 3
    num_classes: int = 10
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, output: str = "logits"):
        def block(x, feats, k, pad, pool):
            x = TorchConv(feats, (k, k), padding=((pad, pad), (pad, pad)))(x)
            if self.use_bn:
                x = _norm("batchnorm", feats, train)(x)
            x = nn.relu(x)
            if pool:
                x = max_pool(x, (2, 2))
            return x

        pad0 = 4 if self.channel == 1 else 2
        x = block(x, 128, 5, pad0, True)
        x = block(x, 192, 5, 2, True)
        x = block(x, 256, 3, 1, False)
        x = block(x, 192, 3, 1, False)
        x = block(x, 192, 3, 1, True)
        feat = flatten(x)
        if output == "feat":
            return feat
        logits = TorchDense(self.num_classes)(feat)
        if output == "both":
            return logits, feat
        return logits


_CFG_VGG = {
    "VGG11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "VGG13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "VGG16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512, "M"],
    "VGG19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


class VGG(nn.Module):
    vgg_name: str = "VGG11"
    channel: int = 3
    num_classes: int = 10
    norm: str = "instancenorm"

    @nn.compact
    def __call__(self, x, train: bool = True, output: str = "logits"):
        ic = 0
        for item in _CFG_VGG[self.vgg_name]:
            if item == "M":
                x = max_pool(x, (2, 2))
            else:
                pad = 3 if (self.channel == 1 and ic == 0) else 1
                x = TorchConv(item, (3, 3), padding=((pad, pad), (pad, pad)))(x)
                x = _norm(self.norm, item, train)(x)
                x = nn.relu(x)
            ic += 1
        feat = flatten(x)
        if output == "feat":
            return feat
        logits = TorchDense(self.num_classes)(feat)
        if output == "both":
            return logits, feat
        return logits


class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "instancenorm"
    avg_pool_down: bool = False  # ResNet_AP variant (networks.py:270-297)

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.avg_pool_down:
            out = TorchConv(self.planes, (3, 3), strides=(1, 1),
                            padding=((1, 1), (1, 1)), use_bias=False)(x)
            out = _norm(self.norm, self.planes, train)(out)
            out = nn.relu(out)
            if self.stride != 1:
                out = avg_pool(out, (2, 2))
        else:
            out = TorchConv(self.planes, (3, 3), strides=(self.stride, self.stride),
                            padding=((1, 1), (1, 1)), use_bias=False)(x)
            out = _norm(self.norm, self.planes, train)(out)
            out = nn.relu(out)
        out = TorchConv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False)(out)
        out = _norm(self.norm, self.planes, train)(out)

        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.planes:
            if self.avg_pool_down:
                shortcut = TorchConv(self.planes, (1, 1), use_bias=False)(x)
                shortcut = avg_pool(shortcut, (2, 2))
            else:
                shortcut = TorchConv(self.planes, (1, 1),
                                     strides=(self.stride, self.stride),
                                     use_bias=False)(x)
            shortcut = _norm(self.norm, self.planes, train)(shortcut)
        return nn.relu(out + shortcut)


class ResNet(nn.Module):
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    channel: int = 3
    num_classes: int = 10
    norm: str = "instancenorm"
    avg_pool_down: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, output: str = "logits"):
        x = TorchConv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False)(x)
        x = _norm(self.norm, 64, train)(x)
        x = nn.relu(x)
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512),
                                                     self.num_blocks)):
            strides = [1 if stage == 0 else 2] + [1] * (blocks - 1)
            for s in strides:
                x = _BasicBlock(planes, s, self.norm, self.avg_pool_down)(x, train)
        if not self.avg_pool_down:
            # reference ResNet: F.avg_pool2d(out, 4) (networks.py:468)
            x = avg_pool(x, (4, 4))
        feat = flatten(x)
        if output == "feat":
            return feat
        logits = TorchDense(self.num_classes)(feat)
        if output == "both":
            return logits, feat
        return logits
