"""Pallas mover pair for the s2d2 pack pipeline (ROADMAP item (a)).

``s2d2_pack`` (models/layers.py) turns (B, F, H, W, C) video into the
(B, F, Hc, Wc, 12C) temporal-im2col + 2x2 space-to-depth view the fused
conv1 stage consumes (Hc = H//2 + 4). Under XLA that chain
(pad -> concat -> reshape -> pad -> reshape/transpose) costs ~100 ms of
pure "data formatting" per S2D-MTT outer step on a v5e across the
fwd/jvp/transpose autodiff passes (profile_step.py r3 rollup) — the
reshape/transpose work runs as HBM round-trips at a fraction of
bandwidth.

Here the whole view change is ONE Pallas pass per direction:

* ``pack``: per-video program loads the (F, H, W*C) frame block once,
  forms all 12 (py, px, dt) slot planes with in-VMEM shuffles, and
  writes the packed (F, Hc, Wc*12C) block — one HBM read + one write.
* ``unpack_sum``: the exact linear transpose — every input pixel
  appears in exactly 3 pack slots (one per temporal offset), so the
  cotangent is a 3-term shifted sum, again one read + one write.

AD closure: the map is LINEAR, so the primitive's JVP is ``pack`` of the
tangent and its transpose is ``unpack_sum`` (and vice versa) — the same
jvp+transpose closure pattern as ``hal_vjp.hal_conv_p``, sufficient for
the reverse-over-forward MTT outer backward (linearize + transpose at
any order).

Parity anchor: the packed layout feeds the fused first stage replacing
the reference's ``nn.Conv3d(k=(3,7,7), s=(1,2,2))`` + ``MaxPool2d(2)``
(``/root/reference/networks.py:799,727-736``); slot order (py, px, dt, c)
is identical to ``layers.s2d2_pack``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.interpreters import ad, batching, mlir

# interpret-mode escape hatch for CPU tests
INTERPRET = False


def _pack_kernel(x_ref, o_ref, *, F, H, W, C):
    """x_ref: (F, H, W*C) one video; o_ref: (F, Hc, Wc*12C)."""
    Hc, Wc = H // 2 + 4, W // 2 + 4
    x = x_ref[:]
    pieces = []  # slot order s = (2*py + px)*3 + dt, channels (s, c)
    for py in (0, 1):
        for px in (0, 1):
            for dt in (0, 1, 2):
                # temporal shift: slot dt of out frame f reads in frame
                # f + dt - 1 (zero beyond the ends)
                if dt == 0:
                    xt = jnp.concatenate(
                        [jnp.zeros((1, H, W * C), x.dtype), x[:F - 1]], 0)
                elif dt == 2:
                    xt = jnp.concatenate(
                        [x[1:], jnp.zeros((1, H, W * C), x.dtype)], 0)
                else:
                    xt = x
                # spatial: padded row 2i + py - 4, col group 2j + px - 4
                xp = jnp.pad(xt, ((0, 0), (4, 4), (4 * C, 4 * C)))
                xv = xp.reshape(F, Hc, 2, Wc, 2 * C)
                pieces.append(xv[:, :, py, :, px * C:(px + 1) * C])
    out = jnp.concatenate([p[:, :, :, None, :] for p in pieces], axis=3)
    o_ref[:] = out.reshape(F, Hc, Wc * 12 * C)


def _unpack_kernel(g_ref, o_ref, *, F, H, W, C):
    """g_ref: (F, Hc, Wc*12C) cotangent; o_ref: (F, H, W*C) = pack^T(g)."""
    Hc, Wc = H // 2 + 4, W // 2 + 4
    g = g_ref[:].reshape(F, Hc, Wc, 12, C)
    acc = jnp.zeros((F, H, W * C), g_ref.dtype)
    for dt in (0, 1, 2):
        # reassemble the padded plane this dt's four (py, px) slots tile
        rows = []
        for py in (0, 1):
            cols = [g[:, :, :, (2 * py + px) * 3 + dt, :] for px in (0, 1)]
            rows.append(jnp.concatenate(cols, axis=-1)  # (F, Hc, Wc, 2C)
                        .reshape(F, Hc, Wc * 2 * C))
        plane = jnp.concatenate(
            [r[:, :, None, :] for r in rows], axis=2).reshape(
            F, 2 * Hc, (W + 8) * C)
        crop = plane[:, 4:4 + H, 4 * C:4 * C + W * C]
        # out frame f slot dt read in frame f + dt - 1, so in frame ff
        # accumulates from out frame ff + 1 - dt
        if dt == 0:
            crop = jnp.concatenate(
                [crop[1:], jnp.zeros((1, H, W * C), crop.dtype)], 0)
        elif dt == 2:
            crop = jnp.concatenate(
                [jnp.zeros((1, H, W * C), crop.dtype), crop[:1 + F - 2]], 0)
        acc = acc + crop
    o_ref[:] = acc


def _pack_impl(x):
    B, F, H, W, C = x.shape
    Hc, Wc = H // 2 + 4, W // 2 + 4
    xf = x.reshape(B, F, H, W * C)
    out = pl.pallas_call(
        functools.partial(_pack_kernel, F=F, H=H, W=W, C=C),
        grid=(B,),
        in_specs=[pl.BlockSpec((None, F, H, W * C),
                               lambda b: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((None, F, Hc, Wc * 12 * C),
                               lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, F, Hc, Wc * 12 * C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(xf)
    return out.reshape(B, F, Hc, Wc, 12 * C)


def _unpack_impl(g, *, H, W):
    B, F, Hc, Wc, C12 = g.shape
    C = C12 // 12
    gf = g.reshape(B, F, Hc, Wc * C12)
    out = pl.pallas_call(
        functools.partial(_unpack_kernel, F=F, H=H, W=W, C=C),
        grid=(B,),
        in_specs=[pl.BlockSpec((None, F, Hc, Wc * C12),
                               lambda b: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((None, F, H, W * C),
                               lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, F, H, W * C), g.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(gf)
    return out.reshape(B, F, H, W, C)


# ---------------------------------------------------------------------------
# linear primitives (jvp + transpose closure, each the other's transpose)
# ---------------------------------------------------------------------------

s2d2_pack_p = jax.extend.core.Primitive("s2d2_pack")
s2d2_unpack_p = jax.extend.core.Primitive("s2d2_unpack_sum")


def pack(x):
    """(B, F, H, W, C) -> (B, F, H//2+4, W//2+4, 12C), == layers.s2d2_pack."""
    return s2d2_pack_p.bind(x)


def unpack_sum(g, H: int, W: int):
    """Linear transpose of :func:`pack`: (B, F, Hc, Wc, 12C) -> video."""
    return s2d2_unpack_p.bind(g, H=H, W=W)


def _pack_abstract(x):
    B, F, H, W, C = x.shape
    return x.update(shape=(B, F, H // 2 + 4, W // 2 + 4, 12 * C),
                    weak_type=False)


def _unpack_abstract(g, *, H, W):
    B, F, Hc, Wc, C12 = g.shape
    return g.update(shape=(B, F, H, W, C12 // 12), weak_type=False)


s2d2_pack_p.def_abstract_eval(_pack_abstract)
s2d2_pack_p.def_impl(_pack_impl)
mlir.register_lowering(s2d2_pack_p,
                       mlir.lower_fun(_pack_impl, multiple_results=False))
s2d2_unpack_p.def_abstract_eval(_unpack_abstract)
s2d2_unpack_p.def_impl(_unpack_impl)
mlir.register_lowering(s2d2_unpack_p,
                       mlir.lower_fun(_unpack_impl, multiple_results=False))

def _pack_transpose(ct, x):
    assert ad.is_undefined_primal(x)
    _, _, H, W, _ = x.aval.shape
    return (unpack_sum(ct, H, W),)


def _unpack_transpose(ct, g, *, H, W):
    assert ad.is_undefined_primal(g)
    return (pack(ct),)


# deflinear2 wires jvp = bind-on-tangents + the transpose rule — exactly
# the closure a linear map needs (reverse = linearize + transpose, any
# order of nesting)
ad.deflinear2(s2d2_pack_p, _pack_transpose)
ad.deflinear2(s2d2_unpack_p, _unpack_transpose)


def _pack_batcher(args, dims):
    (x,), (d,) = args, dims
    x = jnp.moveaxis(x, d, 0)
    V, B = x.shape[0], x.shape[1]
    out = pack(x.reshape((V * B,) + x.shape[2:]))
    return out.reshape((V, B) + out.shape[1:]), 0


def _unpack_batcher(args, dims, *, H, W):
    (g,), (d,) = args, dims
    g = jnp.moveaxis(g, d, 0)
    V, B = g.shape[0], g.shape[1]
    out = unpack_sum(g.reshape((V * B,) + g.shape[2:]), H, W)
    return out.reshape((V, B) + out.shape[1:]), 0


batching.primitive_batchers[s2d2_pack_p] = _pack_batcher
batching.primitive_batchers[s2d2_unpack_p] = _unpack_batcher
