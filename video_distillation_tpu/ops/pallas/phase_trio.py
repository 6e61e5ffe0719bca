"""Pallas phase-max trio (ROADMAP item (b)).

The fused conv1 stage (models/layers.py TemporalIm2ColConv fuse_pool)
ends in a max over 4 pool-phase channel blocks of the (N, 4*O) GEMM
output — the (2,2) spatial max-pool of the reference's first stage
(``/root/reference/networks.py:727-736`` + MaxPool2d). Under XLA the
custom-jvp where-chain formulation re-reads the full 4*O conv output in
BOTH second-order passes to recompute the winner masks (the rof backward
linearizes then transposes), and those where-chains sat at ~133 ms/outer
of "loop fusions" in the r3 v5e profile.

Here the trio restructures the AD around a 1-byte residual:

* ``phase_argmax``: one pass producing the max AND the winning phase
  index (data dtype, exact values 0..3) — torch-MaxPool2d tie order (first maximal
  in 2x2 window scan order), identical to layers._phase_max.
* ``phase_select(t, idx)``: the linearization — pick the winner's
  tangent. Reads t (4*O) + idx (1 byte/element) instead of t + y.
* ``phase_scatter(ct, idx)``: its exact transpose — route the cotangent
  to the winner slot, zeros elsewhere. Reads ct (O) + idx.

AD closure: phase_argmax's JVP emits phase_select (idx tangent is
float0); phase_select/phase_scatter are linear transposes of each other
— closed under any nesting of linearize+transpose, like
ops/pallas/s2d2_move.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.interpreters import ad, batching, mlir

INTERPRET = False

_ROWS = 256  # row-tile; lanes are 4*O (256 at the ConvNet3D width)


def _slices(y, O):
    return tuple(y[:, k * O:(k + 1) * O] for k in range(4))


def _argmax_kernel(y_ref, m_ref, i_ref, *, O):
    # The winner index is carried in the DATA dtype (float values 0..3):
    # Mosaic rejects mixing i1 masks from float compares (8/16-sublane
    # tiling) with int8/int32 selects (32-sublane tiling) — an all-one-
    # dtype kernel needs no relayout. 0..3 are exact in bf16.
    #
    # All compares/selects run in fp32 REGISTERS regardless of the data
    # dtype: Mosaic rejects `cmpf` on the packed (8,128,2) bf16 vector
    # layout ("Target does not support this comparison", v5e) — the
    # in-register upcast keeps VMEM/HBM traffic in the data dtype while
    # giving every compare the native fp32 (8,128) layout.
    y = y_ref[:].astype(jnp.float32)
    y0, y1, y2, y3 = _slices(y, O)
    m01 = jnp.maximum(y0, y1)
    m23 = jnp.maximum(y2, y3)
    i01 = jnp.where(y0 >= y1, jnp.zeros_like(y0), jnp.full_like(y0, 1.0))
    i23 = jnp.where(y2 >= y3, jnp.full_like(y2, 2.0),
                    jnp.full_like(y2, 3.0))
    top = m01 >= m23
    m_ref[:] = jnp.where(top, m01, m23).astype(m_ref.dtype)
    i_ref[:] = jnp.where(top, i01, i23).astype(i_ref.dtype)


def _select_kernel(t_ref, i_ref, o_ref, *, O):
    t0, t1, t2, t3 = _slices(t_ref[:].astype(jnp.float32), O)
    idx = i_ref[:].astype(jnp.float32)
    o_ref[:] = jnp.where(
        idx == 0.0, t0, jnp.where(idx == 1.0, t1,
                                  jnp.where(idx == 2.0, t2, t3))
    ).astype(o_ref.dtype)


def _scatter_kernel(ct_ref, i_ref, o_ref, *, O):
    ct = ct_ref[:].astype(jnp.float32)
    idx = i_ref[:].astype(jnp.float32)
    zero = jnp.zeros_like(ct)
    o_ref[:] = jnp.concatenate(
        [jnp.where(idx == float(k), ct, zero) for k in range(4)],
        axis=-1).astype(o_ref.dtype)


def _row_call(kernel, n, in_arrs, in_lanes, out_shapes):
    """Common (rows, lanes) elementwise-by-row pallas_call wiring."""
    grid = (pl.cdiv(n, _ROWS),)
    in_specs = [pl.BlockSpec((_ROWS, ln), lambda r: (r, 0))
                for ln in in_lanes]
    out_specs = [pl.BlockSpec((_ROWS, ln), lambda r: (r, 0))
                 for ln, _ in out_shapes]
    out_shape = [jax.ShapeDtypeStruct((n, ln), dt) for ln, dt in out_shapes]
    if len(out_shape) == 1:
        out_specs, out_shape = out_specs[0], out_shape[0]
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*in_arrs)


def _argmax_impl(y):
    n, four_o = y.shape
    O = four_o // 4
    return tuple(_row_call(
        functools.partial(_argmax_kernel, O=O), n, (y,), (four_o,),
        [(O, y.dtype), (O, y.dtype)]))


def _select_impl(t, idx):
    n, four_o = t.shape
    O = four_o // 4
    return _row_call(functools.partial(_select_kernel, O=O), n, (t, idx),
                     (four_o, O), [(O, t.dtype)])


def _scatter_impl(ct, idx):
    n, O = ct.shape
    return _row_call(functools.partial(_scatter_kernel, O=O), n,
                     (ct, idx), (O, O), [(4 * O, ct.dtype)])


phase_argmax_p = jax.extend.core.Primitive("phase_argmax")
phase_argmax_p.multiple_results = True
phase_select_p = jax.extend.core.Primitive("phase_select")
phase_scatter_p = jax.extend.core.Primitive("phase_scatter")


def phase_argmax(y):
    return phase_argmax_p.bind(y)


def phase_select(t, idx):
    return phase_select_p.bind(t, idx)


def phase_scatter(ct, idx):
    return phase_scatter_p.bind(ct, idx)


phase_argmax_p.def_abstract_eval(lambda y: (
    y.update(shape=(y.shape[0], y.shape[1] // 4), weak_type=False),
    y.update(shape=(y.shape[0], y.shape[1] // 4), weak_type=False)))
phase_argmax_p.def_impl(_argmax_impl)
mlir.register_lowering(phase_argmax_p,
                       mlir.lower_fun(_argmax_impl, multiple_results=True))

phase_select_p.def_abstract_eval(
    lambda t, idx: t.update(shape=(t.shape[0], t.shape[1] // 4),
                            weak_type=False))
phase_select_p.def_impl(_select_impl)
mlir.register_lowering(phase_select_p,
                       mlir.lower_fun(_select_impl, multiple_results=False))

phase_scatter_p.def_abstract_eval(
    lambda ct, idx: ct.update(shape=(ct.shape[0], ct.shape[1] * 4),
                              weak_type=False))
phase_scatter_p.def_impl(_scatter_impl)
mlir.register_lowering(phase_scatter_p,
                       mlir.lower_fun(_scatter_impl, multiple_results=False))


def _argmax_jvp(primals, tangents):
    (y,), (t,) = primals, tangents
    m, idx = phase_argmax(y)
    if type(t) is ad.Zero:
        tm = ad.Zero(m.aval)
    else:
        tm = phase_select(t, idx)
    return (m, idx), (tm, ad.Zero(idx.aval))


ad.primitive_jvps[phase_argmax_p] = _argmax_jvp


def _select_transpose(ct, t, idx):
    assert ad.is_undefined_primal(t) and not ad.is_undefined_primal(idx)
    return (phase_scatter(ct, idx), None)


def _scatter_transpose(ct, c, idx):
    assert ad.is_undefined_primal(c) and not ad.is_undefined_primal(idx)
    return (phase_select(ct, idx), None)


# linear in the float operand; idx is a constant residual
ad.deflinear2(phase_select_p, _select_transpose)
ad.deflinear2(phase_scatter_p, _scatter_transpose)


def _fold_rows(arr, d):
    arr = jnp.moveaxis(arr, d, 0)
    V, N = arr.shape[0], arr.shape[1]
    return arr.reshape(V * N, arr.shape[2]), V, N


def _argmax_batcher(args, dims):
    (y,), (d,) = args, dims
    yf, V, N = _fold_rows(y, d)
    m, idx = phase_argmax(yf)
    return ((m.reshape(V, N, -1), idx.reshape(V, N, -1)), (0, 0))


def _bin_batcher(bind, args, dims):
    a, idx = args
    da, di = dims
    if da is batching.not_mapped or di is batching.not_mapped:
        raise NotImplementedError("phase trio: both operands must share "
                                  "the vmapped axis")
    af, V, N = _fold_rows(a, da)
    idxf, _, _ = _fold_rows(idx, di)
    out = bind(af, idxf)
    return out.reshape(V, N, -1), 0


batching.primitive_batchers[phase_argmax_p] = _argmax_batcher
batching.primitive_batchers[phase_select_p] = functools.partial(
    _bin_batcher, phase_select)
batching.primitive_batchers[phase_scatter_p] = functools.partial(
    _bin_batcher, phase_scatter)


def phase_max(y):
    """(..., 4*O) -> (..., O) max over the 4 contiguous phase blocks —
    drop-in for layers._phase_max with the 1-byte-residual AD."""
    lead = y.shape[:-1]
    m, _ = phase_argmax(y.reshape(int(np.prod(lead)), y.shape[-1]))
    return m.reshape(lead + (y.shape[-1] // 4,))
