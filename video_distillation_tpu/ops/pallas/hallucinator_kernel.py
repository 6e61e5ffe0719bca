"""Pallas TPU kernel: fused hallucinator composition.

The hallucinator (``models/hallucinator.py``, parity with
``/root/reference/utils.py:1178-1197``) broadcasts a static RGB still to F
frames, concatenates a 1-channel dynamic volume, and applies a
Conv3d(4->3, k=3, pad=1). Under XLA this materialises the
``(B, F, H, W, 4)`` broadcast+concat tensor in HBM before a conv whose
4-in/3-out channels waste almost the entire 128x128 MXU tile.

This kernel fuses the whole composition: each grid program holds one
sample's static planes + dynamic volume in VMEM and accumulates the 27-tap
stencil directly on the VPU — no intermediate tensor, no MXU padding. The
324 tap weights live in SMEM. Every in-kernel array is a plain (F,H,W) or
(H,W) block (RGB channels are separate refs) to keep Mosaic's vector
layouts on the well-trodden path.

Forward-only: it serves the evaluation path, where the synthetic memories
are frozen (``utils.py:462-496`` composes without gradients); the
distillation path keeps the autodiff-able XLA conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(w_ref, b_ref, s0_ref, s1_ref, s2_ref, dyn_ref,
            o0_ref, o1_ref, o2_ref, *, frames, height, width):
    # w_ref: (324,) SMEM tap-major (tap, ci, co); b_ref: (3,) SMEM
    # s*_ref: (H, W) static channel planes; dyn_ref: (F, H, W)
    # o*_ref: (F, H, W) output channel volumes
    dynamic = dyn_ref[:]
    statics = (s0_ref[:], s1_ref[:], s2_ref[:])

    f_idx = jax.lax.broadcasted_iota(jnp.int32, (frames, height, width), 0)
    h3 = jax.lax.broadcasted_iota(jnp.int32, (frames, height, width), 1)
    w3 = jax.lax.broadcasted_iota(jnp.int32, (frames, height, width), 2)
    h2 = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    w2 = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)

    def shifted_dynamic(dt, dh, dw):
        p = dynamic
        if dt:
            p = pltpu.roll(p, (-dt) % frames, axis=0)
        if dh:
            p = pltpu.roll(p, (-dh) % height, axis=1)
        if dw:
            p = pltpu.roll(p, (-dw) % width, axis=2)
        valid = ((f_idx + dt >= 0) & (f_idx + dt < frames) &
                 (h3 + dh >= 0) & (h3 + dh < height) &
                 (w3 + dw >= 0) & (w3 + dw < width))
        return jnp.where(valid, p, 0.0)

    def shifted_static(ci, dt, dh, dw):
        p = statics[ci]
        if dh:
            p = pltpu.roll(p, (-dh) % height, axis=0)
        if dw:
            p = pltpu.roll(p, (-dw) % width, axis=1)
        valid2 = ((h2 + dh >= 0) & (h2 + dh < height) &
                  (w2 + dw >= 0) & (w2 + dw < width))
        p = jnp.where(valid2, p, 0.0)
        tvalid = (f_idx + dt >= 0) & (f_idx + dt < frames)
        return jnp.where(tvalid, jnp.broadcast_to(p, (frames, height,
                                                      width)), 0.0)

    outs = (o0_ref, o1_ref, o2_ref)
    for co in range(3):
        acc = jnp.full((frames, height, width), b_ref[co], jnp.float32)
        tap = 0
        for dt in (-1, 0, 1):
            for dh in (-1, 0, 1):
                for dw in (-1, 0, 1):
                    for ci in range(4):
                        wgt = w_ref[(tap * 4 + ci) * 3 + co]
                        if ci < 3:
                            acc += wgt * shifted_static(ci, dt, dh, dw)
                        else:
                            acc += wgt * shifted_dynamic(dt, dh, dw)
                    tap += 1
        outs[co][:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def hallucinate_fused(static, dynamic, kernel, bias, interpret=False):
    """static (B,H,W,3), dynamic (B,F,H,W,1), kernel (3,3,3,4,3) flax
    layout (kt,kh,kw,in,out), bias (3,) -> (B,F,H,W,3)."""
    b, f, h, w, _ = dynamic.shape
    w_flat = kernel.reshape(-1).astype(jnp.float32)  # tap-major (tap,ci,co)
    bias1 = bias.reshape(-1).astype(jnp.float32)
    dyn = dynamic[..., 0].astype(jnp.float32)
    s = static.astype(jnp.float32)
    s0, s1, s2 = s[..., 0], s[..., 1], s[..., 2]  # (B,H,W) each

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # weights + bias in SMEM
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, h, w), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((None, h, w), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((None, h, w), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((None, f, h, w), lambda i, *_: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, f, h, w), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((None, f, h, w), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((None, f, h, w), lambda i, *_: (i, 0, 0, 0)),
        ],
    )
    o0, o1, o2 = pl.pallas_call(
        functools.partial(_kernel, frames=f, height=h, width=w),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, f, h, w), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w_flat, bias1, s0, s1, s2, dyn)
    return jnp.stack([o0, o1, o2], axis=-1)  # (B,F,H,W,3)


def hallucinate_fused_from_params(hal_params, static, dynamic,
                                  interpret=False):
    """Adapter taking the flax Hallucinator param pytree."""
    return hallucinate_fused(static, dynamic, hal_params["kernel"],
                             hal_params["bias"], interpret=interpret)
