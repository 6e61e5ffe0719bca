"""ConvNet (2D) — the DC-lineage image ConvNet with depth/width/act/norm/pool
knobs, used by the eval-model pools and static-memory learning.

Parity with ``/root/reference/networks.py:42-116``: each block is
Conv2d(k=3, pad 1; pad 3 for the first layer of 1-channel inputs) -> norm ->
act -> pool(2,2); head is a single Linear. ``embed`` is the flattened
feature stack. Input layout: ``(B, H, W, C)``.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from .layers import TorchConv, TorchDense, activation, avg_pool, flatten, max_pool, norm_layer


class ConvNet2D(nn.Module):
    channel: int = 3
    num_classes: int = 10
    net_width: int = 128
    net_depth: int = 3
    net_act: str = "relu"
    net_norm: str = "instancenorm"
    net_pooling: str = "avgpooling"
    im_size: Tuple[int, int] = (32, 32)

    @nn.compact
    def __call__(self, x, train: bool = True, output: str = "logits"):
        act = activation(self.net_act)
        for d in range(self.net_depth):
            pad = 3 if (self.channel == 1 and d == 0) else 1
            x = TorchConv(
                features=self.net_width,
                kernel_size=(3, 3),
                padding=((pad, pad), (pad, pad)),
            )(x)
            norm = norm_layer(self.net_norm, channels=self.net_width, spatial_rank=2,
                              train=train)
            if norm is not None:
                x = norm(x)
            x = act(x)
            if self.net_pooling == "maxpooling":
                x = max_pool(x, (2, 2))
            elif self.net_pooling == "avgpooling":
                x = avg_pool(x, (2, 2))
            elif self.net_pooling != "none":
                raise ValueError(f"unknown net_pooling: {self.net_pooling}")

        feat = flatten(x)
        if output == "feat":
            return feat
        logits = TorchDense(self.num_classes)(feat)
        if output == "both":
            return logits, feat
        return logits
