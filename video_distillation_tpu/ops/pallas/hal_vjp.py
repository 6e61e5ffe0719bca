"""Differentiable Pallas hallucinator: primitive + fwd/dgrad/wgrad kernels.

The hallucinator composition (parity: ``/root/reference/utils.py:1178-1197``)
is Conv3d(4->3, k=3) over [broadcast static | dynamic]. Under XLA the
4-in/3-out channels hit the worst conv emitters on TPU (wgrad at 1.7 TF/s,
~25 ms of batch-minor layout copies around every instance — measured on a
v5e at the miniUCF101 S2D-MTT shapes, ~44 ms per outer step in total).

Here the whole composition is three VPU stencil kernels:

* ``fwd``: temporal taps of the (time-constant) static planes collapse to
  three 2-D stencils (interior / first-frame / last-frame sums) + a 27-tap
  stencil of the dynamic volume — ~19 GF instead of the naive 65 GF.
* ``dgrad``: cotangents for (static, dynamic) from one pass over ȳ.
* ``wgrad``: kernel + bias cotangents, accumulated across the sample grid.

AD is wired as a multilinear primitive (``hal_conv_p``): JVP per argument
re-uses the forward kernel (the map is linear in (static, dynamic) given
the kernel, and linear in (kernel, bias) given the inputs); the transpose
rule dispatches to dgrad/wgrad. This gives the full jvp+transpose closure
the MTT outer backward needs (reverse-mode = linearize + transpose), with
no jvp-of-jvp requirement (the hallucinator sits outside the inner unroll).

Layouts: static (B, H, W, 3), dynamic (B, F, H, W, 1), kernel
(3, 3, 3, 4, 3) DHWIO (taps (kt, kh, kw), in = [RGB static | dynamic]),
bias (3,), y (B, F, H, W, 3) — identical to models/hallucinator.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.interpreters import ad, mlir

# interpret-mode escape hatch for CPU tests
INTERPRET = False


def _shift2(p, dh, dw, h2, w2, height, width):
    """Shifted 2-D plane with zero fill (roll + iota mask)."""
    if dh:
        p = pltpu.roll(p, (-dh) % height, axis=0)
    if dw:
        p = pltpu.roll(p, (-dw) % width, axis=1)
    valid = ((h2 + dh >= 0) & (h2 + dh < height) &
             (w2 + dw >= 0) & (w2 + dw < width))
    return jnp.where(valid, p, 0.0)


def _shift3(p, dt, dh, dw, f3, h3, w3, frames, height, width):
    """Shifted 3-D volume with zero fill."""
    if dt:
        p = pltpu.roll(p, (-dt) % frames, axis=0)
    if dh:
        p = pltpu.roll(p, (-dh) % height, axis=1)
    if dw:
        p = pltpu.roll(p, (-dw) % width, axis=2)
    valid = ((f3 + dt >= 0) & (f3 + dt < frames) &
             (h3 + dh >= 0) & (h3 + dh < height) &
             (w3 + dw >= 0) & (w3 + dw < width))
    return jnp.where(valid, p, 0.0)


# weight vector layout in SMEM: kernel (3,3,3,4,3) flattened tap-major
# (kt, kh, kw, ci, co) — index ((kt*3+kh)*3+kw)*12 + ci*3 + co — followed
# by the 3 biases.
def _widx(kt, kh, kw, ci, co):
    return (((kt * 3 + kh) * 3 + kw) * 4 + ci) * 3 + co


_NW = 3 * 3 * 3 * 4 * 3  # 324


def _fwd_kernel(w_ref, s0, s1, s2, dyn, o0, o1, o2, *, frames, height,
                width):
    f3 = jax.lax.broadcasted_iota(jnp.int32, (frames, height, width), 0)
    h3 = jax.lax.broadcasted_iota(jnp.int32, (frames, height, width), 1)
    w3 = jax.lax.broadcasted_iota(jnp.int32, (frames, height, width), 2)
    h2 = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    w2 = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    statics = (s0[:].astype(jnp.float32), s1[:].astype(jnp.float32),
               s2[:].astype(jnp.float32))
    d = dyn[:].astype(jnp.float32)
    outs = (o0, o1, o2)

    # static part: 2-D planes. u_full = all-tap sum; u_first excludes the
    # kt=0 tap (frame 0 has no t-1 input); u_last excludes kt=2.
    u_full = [jnp.zeros((height, width), jnp.float32) for _ in range(3)]
    u_first = [jnp.zeros((height, width), jnp.float32) for _ in range(3)]
    u_last = [jnp.zeros((height, width), jnp.float32) for _ in range(3)]
    for kh in range(3):
        for kw in range(3):
            for ci in range(3):
                sp = _shift2(statics[ci], kh - 1, kw - 1, h2, w2, height,
                             width)
                for co in range(3):
                    wsum = (w_ref[_widx(0, kh, kw, ci, co)] +
                            w_ref[_widx(1, kh, kw, ci, co)] +
                            w_ref[_widx(2, kh, kw, ci, co)])
                    u_full[co] += wsum * sp
                    u_first[co] += w_ref[_widx(0, kh, kw, ci, co)] * sp
                    u_last[co] += w_ref[_widx(2, kh, kw, ci, co)] * sp

    acc = []
    for co in range(3):
        a = jnp.broadcast_to(u_full[co] + w_ref[_NW + co],
                             (frames, height, width))
        a = a - jnp.where(f3 == 0, u_first[co], 0.0)
        a = a - jnp.where(f3 == frames - 1, u_last[co], 0.0)
        acc.append(a)

    # dynamic part: 27-tap stencil, one shift per tap, 3 co FMAs each
    for kt in range(3):
        for kh in range(3):
            for kw in range(3):
                dp = _shift3(d, kt - 1, kh - 1, kw - 1, f3, h3, w3,
                             frames, height, width)
                for co in range(3):
                    acc[co] = acc[co] + w_ref[_widx(kt, kh, kw, 3,
                                                    co)] * dp
    for co in range(3):
        outs[co][:] = acc[co].astype(outs[co].dtype)


def _dgrad_kernel(w_ref, g0, g1, g2, *out_refs, frames, height, width,
                  need_s, need_d):
    """Cotangents: ds_c = sum over taps/co of T_kt * flipped stencil;
    dd = 27-tap flipped stencil of ȳ. Only the requested outputs are
    computed (static is frozen in the ipc=1 S2D presets — its stencil
    work would be pure waste)."""
    f3 = jax.lax.broadcasted_iota(jnp.int32, (frames, height, width), 0)
    h3 = jax.lax.broadcasted_iota(jnp.int32, (frames, height, width), 1)
    w3 = jax.lax.broadcasted_iota(jnp.int32, (frames, height, width), 2)
    h2 = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    w2 = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    gs = (g0[:].astype(jnp.float32), g1[:].astype(jnp.float32),
          g2[:].astype(jnp.float32))
    refs = list(out_refs)

    if need_s:
        # temporal-collapsed sums of ȳ per static tap kt:
        # kt=0 contributes to frames t>=1, kt=1 to all, kt=2 to t<=F-2
        s_all = [jnp.sum(g, axis=0) for g in gs]
        s_first = [g[0] for g in gs]
        s_last = [g[frames - 1] for g in gs]
        sacc = [jnp.zeros((height, width), jnp.float32) for _ in range(3)]
        for kh in range(3):
            for kw in range(3):
                for co in range(3):
                    t0 = s_all[co] - s_first[co]
                    t1 = s_all[co]
                    t2 = s_all[co] - s_last[co]
                    for ci in range(3):
                        w0 = w_ref[_widx(0, kh, kw, ci, co)]
                        w1 = w_ref[_widx(1, kh, kw, ci, co)]
                        w2_ = w_ref[_widx(2, kh, kw, ci, co)]
                        plane = w0 * t0 + w1 * t1 + w2_ * t2
                        sacc[ci] += _shift2(plane, 1 - kh, 1 - kw, h2,
                                            w2, height, width)
        for ci in range(3):
            refs[ci][:] = sacc[ci].astype(refs[ci].dtype)
        refs = refs[3:]

    if need_d:
        dacc = jnp.zeros((frames, height, width), jnp.float32)
        for kt in range(3):
            for kh in range(3):
                for kw in range(3):
                    sh = _shift3(gs[0], 1 - kt, 1 - kh, 1 - kw, f3, h3,
                                 w3, frames, height, width)
                    acc = w_ref[_widx(kt, kh, kw, 3, 0)] * sh
                    for co in (1, 2):
                        sh = _shift3(gs[co], 1 - kt, 1 - kh, 1 - kw, f3,
                                     h3, w3, frames, height, width)
                        acc = acc + w_ref[_widx(kt, kh, kw, 3, co)] * sh
                    dacc = dacc + acc
        refs[0][:] = dacc.astype(refs[0].dtype)


def _wgrad_kernel(g0, g1, g2, s0, s1, s2, dyn, wout, *, frames, height,
                  width):
    """K̄ rows (108 = tap-major (kt,kh,kw,ci)) x 3 co, + b̄ as row 108."""
    f3 = jax.lax.broadcasted_iota(jnp.int32, (frames, height, width), 0)
    h3 = jax.lax.broadcasted_iota(jnp.int32, (frames, height, width), 1)
    w3 = jax.lax.broadcasted_iota(jnp.int32, (frames, height, width), 2)
    h2 = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    w2 = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    gs = (g0[:].astype(jnp.float32), g1[:].astype(jnp.float32),
          g2[:].astype(jnp.float32))
    statics = (s0[:].astype(jnp.float32), s1[:].astype(jnp.float32),
               s2[:].astype(jnp.float32))
    d = dyn[:].astype(jnp.float32)

    s_all = [jnp.sum(g, axis=0) for g in gs]
    s_first = [g[0] for g in gs]
    s_last = [g[frames - 1] for g in gs]
    # per-tap valid temporal sums of ȳ (kt=0 misses frame 0, kt=2 the
    # last frame — same windows as the forward's static collapse)
    tsums = [[s_all[co] - s_first[co], s_all[co],
              s_all[co] - s_last[co]] for co in range(3)]

    rows = []
    for kt in range(3):
        for kh in range(3):
            for kw in range(3):
                dp = None
                for ci in range(4):
                    cos = []
                    for co in range(3):
                        if ci < 3:
                            sp = _shift2(statics[ci], kh - 1, kw - 1, h2,
                                         w2, height, width)
                            cos.append(jnp.sum(tsums[co][kt] * sp))
                        else:
                            if dp is None:
                                dp = _shift3(d, kt - 1, kh - 1, kw - 1,
                                             f3, h3, w3, frames, height,
                                             width)
                            cos.append(jnp.sum(gs[co] * dp))
                    rows.append(cos)
    rows.append([jnp.sum(gs[co]) for co in range(3)])  # bias row 108
    while len(rows) < 112:
        rows.append([jnp.float32(0.0)] * 3)
    part = jnp.array(rows, jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        wout[:] = jnp.zeros_like(wout)

    wout[:] += part


def _flat_w(kernel, bias):
    return jnp.concatenate(
        [kernel.reshape(-1).astype(jnp.float32),
         bias.reshape(-1).astype(jnp.float32)])


def _sample_specs(h, w, f):
    plane = pl.BlockSpec((None, h, w), lambda i, *_: (i, 0, 0))
    vol = pl.BlockSpec((None, f, h, w), lambda i, *_: (i, 0, 0, 0))
    return plane, vol


def _fwd_impl(static, dynamic, kernel, bias):
    b, f, h, w, _ = dynamic.shape
    dt = dynamic.dtype
    plane, vol = _sample_specs(h, w, f)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b,),
        in_specs=[plane, plane, plane, vol],
        out_specs=[vol, vol, vol])
    o0, o1, o2 = pl.pallas_call(
        functools.partial(_fwd_kernel, frames=f, height=h, width=w),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, f, h, w), dt)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(_flat_w(kernel, bias), static[..., 0], static[..., 1],
      static[..., 2], dynamic[..., 0])
    return jnp.stack([o0, o1, o2], axis=-1)


def _dgrad_impl(g, kernel, b, f, h, w, dt, need_s=True, need_d=True):
    plane, vol = _sample_specs(h, w, f)
    out_specs, out_shape = [], []
    if need_s:
        out_specs += [plane, plane, plane]
        out_shape += [jax.ShapeDtypeStruct((b, h, w), dt)] * 3
    if need_d:
        out_specs += [vol]
        out_shape += [jax.ShapeDtypeStruct((b, f, h, w), dt)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b,),
        in_specs=[vol, vol, vol], out_specs=out_specs)
    zb = jnp.zeros((3,), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_dgrad_kernel, frames=f, height=h, width=w,
                          need_s=need_s, need_d=need_d),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(_flat_w(kernel, zb), g[..., 0], g[..., 1], g[..., 2])
    outs = list(outs)
    ds = jnp.stack(outs[:3], axis=-1) if need_s else None
    dd = outs[-1][..., None] if need_d else None
    return ds, dd


def _wgrad_impl(g, static, dynamic):
    b, f, h, w, _ = dynamic.shape
    plane, vol = _sample_specs(h, w, f)
    acc = pl.BlockSpec((112, 3), lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_wgrad_kernel, frames=f, height=h, width=w),
        grid=(b,),
        in_specs=[vol, vol, vol, plane, plane, plane, vol],
        out_specs=acc,
        out_shape=jax.ShapeDtypeStruct((112, 3), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(g[..., 0], g[..., 1], g[..., 2], static[..., 0], static[..., 1],
      static[..., 2], dynamic[..., 0])
    dk = out[:108].reshape(3, 3, 3, 4, 3)
    db = out[108]
    return dk, db


# ---------------------------------------------------------------------------
# the multilinear primitive
# ---------------------------------------------------------------------------

hal_conv_p = jax.extend.core.Primitive("hal_conv")


def hal_conv(static, dynamic, kernel, bias):
    """y = Conv3d([broadcast(static) | dynamic], kernel) + bias via the
    Pallas kernels; linear in (static, dynamic) given kernel, and in
    (kernel, bias) given the inputs."""
    return hal_conv_p.bind(static, dynamic, kernel, bias)


def _abstract(static, dynamic, kernel, bias):
    b, f, h, w, _ = dynamic.shape
    return static.update(shape=(b, f, h, w, 3), dtype=dynamic.dtype,
                         weak_type=False)


hal_conv_p.def_abstract_eval(_abstract)
hal_conv_p.def_impl(_fwd_impl)
mlir.register_lowering(hal_conv_p, mlir.lower_fun(_fwd_impl,
                                                  multiple_results=False))


def _jvp_s(ds, static, dynamic, kernel, bias):
    return hal_conv(ds, jnp.zeros_like(dynamic), kernel,
                    jnp.zeros_like(bias))


def _jvp_d(dd, static, dynamic, kernel, bias):
    return hal_conv(jnp.zeros_like(static), dd, kernel,
                    jnp.zeros_like(bias))


def _jvp_k(dk, static, dynamic, kernel, bias):
    return hal_conv(static, dynamic, dk, jnp.zeros_like(bias))


def _jvp_b(db, static, dynamic, kernel, bias):
    b, f, h, w, _ = dynamic.shape
    return jnp.broadcast_to(db.astype(dynamic.dtype), (b, f, h, w, 3))


ad.defjvp(hal_conv_p, _jvp_s, _jvp_d, _jvp_k, _jvp_b)


def _transpose(ct, static, dynamic, kernel, bias):
    """Cotangents for whichever inputs are linear in this application."""
    s_lin = ad.is_undefined_primal(static)
    d_lin = ad.is_undefined_primal(dynamic)
    k_lin = ad.is_undefined_primal(kernel)
    b_lin = ad.is_undefined_primal(bias)
    ct_s = ct_d = ct_k = ct_b = None
    if s_lin or d_lin:
        kval = kernel if not k_lin else None
        assert kval is not None, "hal_conv transpose: kernel must be known"
        ds, dd = _dgrad_impl(ct, kval, *ct.shape[:4], ct.dtype,
                             need_s=s_lin, need_d=d_lin)
        if s_lin:
            ct_s = ds
        if d_lin:
            ct_d = dd
    if k_lin or b_lin:
        assert not ad.is_undefined_primal(static)
        assert not ad.is_undefined_primal(dynamic)
        dk, db = _wgrad_impl(ct, static, dynamic)
        if k_lin:
            ct_k = dk.astype(kernel.aval.dtype)
        if b_lin:
            ct_b = db.astype(bias.aval.dtype)
    return ct_s, ct_d, ct_k, ct_b


ad.primitive_transposes[hal_conv_p] = _transpose


def _batching(args, dims):
    """vmap over static/dynamic folds into the sample axis; a vmapped
    kernel/bias has no kernel-level equivalent here."""
    from jax.interpreters import batching

    s, d, k, b = args
    sd, dd_, kd, bd = dims
    if kd is not batching.not_mapped or bd is not batching.not_mapped:
        raise NotImplementedError(
            "hal_conv: vmap over kernel/bias is not supported — use the "
            "flax Hallucinator for per-net hallucinator parameters")
    sizes = {a.shape[dim] for a, dim in ((s, sd), (d, dd_))
             if dim is not batching.not_mapped}
    (v,) = sizes
    if sd is not batching.not_mapped:
        s = jnp.moveaxis(s, sd, 0)
    else:
        s = jnp.broadcast_to(s[None], (v,) + s.shape)
    if dd_ is not batching.not_mapped:
        d = jnp.moveaxis(d, dd_, 0)
    else:
        d = jnp.broadcast_to(d[None], (v,) + d.shape)
    vb, bb = s.shape[0] * s.shape[1], d.shape[1]
    out = hal_conv(s.reshape((vb,) + s.shape[2:]),
                   d.reshape((s.shape[0] * bb,) + d.shape[2:]), k, b)
    return out.reshape((v, bb) + out.shape[1:]), 0


from jax.interpreters import batching as _batching_mod

_batching_mod.primitive_batchers[hal_conv_p] = _batching


def hal_conv_from_params(hal_params, static, dynamic):
    """Adapter over the flax Hallucinator param pytree ('concat' mode)."""
    return hal_conv(static, dynamic, hal_params["kernel"],
                    hal_params["bias"])
