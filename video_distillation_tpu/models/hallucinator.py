"""Hallucinator — composes static RGB stills + 1-channel motion volumes
into synthetic videos.

Parity with the reference ``Conv3DNet`` (``/root/reference/utils.py:1178-1197``):
a single Conv3d(4 -> 3, k=3, pad=1). In 'concat' mode the static image is
broadcast across frames and the dynamic channel is appended as a 4th input
channel; 'add' mode adds the dynamic volume to the (3-channel) static
broadcast instead.

Layout here: static ``(B, H, W, 3)``, dynamic ``(B, F, H, W, 1)``,
output video ``(B, F, H, W, 3)`` (NDHWC).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import TorchConv


class Hallucinator(nn.Module):
    mid_channel: int = 3
    kernel_size: int = 3
    mode: str = "concat"

    @nn.compact
    def __call__(self, static, dynamic):
        # static: (B, H, W, 3); dynamic: (B, F, H, W, 1)
        frames = dynamic.shape[1]
        static_b = jnp.broadcast_to(
            static[:, None], (static.shape[0], frames) + static.shape[1:]
        )
        if self.mode == "concat":
            x = jnp.concatenate([static_b, dynamic], axis=-1)  # (B,F,H,W,4)
        elif self.mode == "add":
            x = static_b + dynamic
        else:
            raise NotImplementedError(self.mode)
        k = self.kernel_size
        pad = k // 2
        return TorchConv(
            features=self.mid_channel,
            kernel_size=(k, k, k),
            padding=((pad, pad),) * 3,
        )(x)
