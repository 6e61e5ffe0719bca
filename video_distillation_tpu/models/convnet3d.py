"""ConvNet3D — the workhorse video classifier, rebuilt NDHWC for TPU.

Architecture parity with the reference torch model
(``/root/reference/networks.py:727-814``):

* depth-3 stack of Conv3d k=(3,7,7), stride (1,2,2), padding (1,3,3);
  first layer 64 channels, later layers ``net_width`` (:799-802)
* optional norm (factory forces 'none' for ConvNet3D — utils.py:609)
* ReLU (default act), MaxPool3d (1,2,2) after the first block and
  (2,2,2) after later blocks (:765-770)
* head: AvgPool3d kernel (2,2,2) stride 1 when im_size[0] > 64 else
  (2,1,1) (:733), Dropout(0.5) (:735), 1x1x1 Conv3d to num_classes (:736),
  then max over the remaining time axis (:744)
* ``embed`` flattens the backbone features (:747-751); all losses that
  consume it (DM mean-matching, coreset distances) are permutation
  invariant, so the NDHWC vs NCDHW flatten order difference is immaterial.

Input layout here is ``(B, F, H, W, C)`` (the reference takes (B,F,C,H,W)
and permutes to NCDHW; on TPU channels-last feeds the MXU directly).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import (TemporalIm2ColConv, TorchConv, activation, avg_pool,
                     flatten, max_pool, norm_layer, stage_island)

# perf escape hatch: the space-to-depth fused first stage trades 2.9x
# conv1 FLOPs for layout sanity — a clear win for the bf16 second-order
# MTT unroll, roughly neutral for fp32 eval. Flip for A/B measurements
# (env override VD_FUSE_FIRST_STAGE=0/1 for profiling runs).
import os as _os

FUSE_FIRST_STAGE = _os.environ.get("VD_FUSE_FIRST_STAGE", "1") != "0"


class ConvNet3D(nn.Module):
    channel: int = 3
    num_classes: int = 50
    net_width: int = 128
    net_depth: int = 3
    net_act: str = "relu"
    net_norm: str = "none"
    net_pooling: str = "maxpooling"
    frames: int = 16
    im_size: Tuple[int, int] = (112, 112)
    dropout_rate: float = 0.5
    # accept layers.s2d2_pack'ed input (B, F, Hc, Wc, 12C): MTT unrolls
    # stage batches pre-packed so the im2col/space-to-depth formatting
    # runs once per outer step instead of in every autodiff pass
    packed_input: bool = False

    @classmethod
    def supports_packed_input(cls, net_pooling="maxpooling",
                              net_norm="none", net_act="relu",
                              im_size=(112, 112)):
        from . import convnet3d as _self_mod
        from .layers import S2D_POOL_MODE

        return (_self_mod.FUSE_FIRST_STAGE and S2D_POOL_MODE == "s2d2"
                and net_pooling == "maxpooling" and net_norm == "none"
                and net_act in ("relu", "leakyrelu", "sigmoid")
                and im_size[0] % 4 == 0 and im_size[1] % 4 == 0)

    @nn.compact
    def __call__(self, x, train: bool = True, output: str = "logits"):
        # x: (B, F, H, W, C) — or s2d2-packed when packed_input is set
        act = activation(self.net_act)
        base_dt = x.dtype  # fp32-island boundaries cast back to this
        for d in range(self.net_depth):
            x = stage_island(x, f"s{d + 1}", base_dt)
            feats = 64 if d == 0 else self.net_width
            if d == 0 and self.packed_input:
                assert self.supports_packed_input(
                    self.net_pooling, self.net_norm, self.net_act,
                    self.im_size)
                x = TemporalIm2ColConv(features=feats, fuse_pool=True,
                                       pre_packed=True)(x)
                x = act(x)
                continue
            if d == 0:
                # first layer as temporal-im2col conv2d: identical math,
                # ~3x faster backward on TPU at C_in=3 (see layers.py);
                # with maxpooling + no norm the spatial (2,2) pool is
                # additionally folded into the conv (space-to-depth) —
                # the layer then emits bias->pool->relu-ready output.
                # pool-before-act only commutes for monotone activations,
                # so swish (non-monotonic) must take the unfused path
                fuse = (FUSE_FIRST_STAGE
                        and self.net_pooling == "maxpooling"
                        and self.net_norm == "none"
                        and self.net_act in ("relu", "leakyrelu", "sigmoid")
                        and x.shape[2] % 4 == 0 and x.shape[3] % 4 == 0)
                x = TemporalIm2ColConv(features=feats, fuse_pool=fuse)(x)
                if fuse:
                    x = act(x)
                    continue
            else:
                # later layers use the same temporal-im2col 2-D conv: the
                # 3-D conv forces a batch-minor activation layout on TPU
                # that surrounds every relu/pool backward with transpose
                # copies; all-2-D keeps the net in plain NHWC throughout
                x = TemporalIm2ColConv(features=feats)(x)
            norm = norm_layer(self.net_norm, channels=feats, spatial_rank=3,
                              train=train)
            if norm is not None:
                x = norm(x)
            x = act(x)
            if self.net_pooling == "maxpooling":
                x = max_pool(x, (1, 2, 2) if d == 0 else (2, 2, 2))
            elif self.net_pooling == "avgpooling":
                x = avg_pool(x, (2, 2, 2))
            elif self.net_pooling != "none":
                raise ValueError(f"unknown net_pooling: {self.net_pooling}")

        # island-boundary cast: with 's3' fp32-islanded, x is still fp32
        # here — embed consumers (DM mean-matching) expect the compute
        # dtype, so cast back before the feat return (ADVICE r4)
        feat = flatten(x).astype(base_dt)
        if output == "feat":
            return feat

        head_window = (2, 2, 2) if self.im_size[0] > 64 else (2, 1, 1)
        x = stage_island(x, "head", base_dt)
        x = avg_pool(x, head_window, strides=(1, 1, 1))
        x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        x = TorchConv(features=self.num_classes, kernel_size=(1, 1, 1))(x)
        # (B, T', H', W', num_classes) -> squeeze spatial, max over time
        x = x.squeeze(axis=(2, 3))
        logits = jnp.max(x, axis=1)
        if output == "both":
            return logits, feat
        return logits
