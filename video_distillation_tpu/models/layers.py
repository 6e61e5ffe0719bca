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
import numpy as np
import flax.linen as nn
from jax.interpreters import ad, batching, mlir


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


# A/B toggle for the wide-layer shifted-sum formulation (see
# TemporalIm2ColConv); flip to False to take the channel-concat im2col
# path instead for measurements.
TEMPORAL_SUM_PATH = True

# Formulation of the fused conv1+pool first stage. All modes produce
# identical phase outputs:
#   "s2d2" — 2x2 cells, (5,5,36,4O) packed kernel, 2.05x tap inflation.
#   "s2d4" — 4x4 cells, (3,3,16*3C,4O), 2.9x inflation.
#   "direct10" — ONE 10x10 stride-4 conv on the 9-channel temporal-im2col
#     input with the four pool phases scattered into (10,10,3C,4O) kernel
#     blocks; the phase geometry is absorbed into the conv's own patch
#     extraction, so the s2d2 packing pipeline (~110 ms/outer of pure
#     data formatting in the S2D-MTT autodiff passes) disappears.
#     MEASURED NET LOSS on the v5e full rof graph (880 vs 810 ms/outer
#     device self-time): XLA's dgrad emitter for the stride-4 10x10
#     transposed conv runs at ~2.2x the s2d2 dgrad's time (162 vs 72 ms)
#     and wgrad/fwd are ~1.5x, more than refunding the formatting win.
#     Kept as an A/B mode — an isolated fwd+dgrad+wgrad probe measured
#     it 2.1x FASTER, a reminder that only full-graph traces count.
import os as _os

S2D_POOL_MODE = _os.environ.get("VD_S2D_POOL_MODE", "s2d2")

# Conv lowering for the hot 2-D convs: "native" = lax.conv_general_dilated,
# "gemm" = strided-slice im2col + dot_general, "auto" (default) = gemm on
# CPU / native elsewhere. Rationale (measured, r4): XLA-CPU emits the
# SECOND-order (transpose-of-jvp) weight-gradients of stride-2 convs as
# rhs-dilated convolutions with no fast path — a single conv1 wgrad ran
# 20 s at 4-class 64^2 MTT-test shapes, making one second-order step
# ~170 s (~35x slower than the torch reference's CPU unroll). With the
# gemm lowering every derivative stays slices/pads/dot_general and the
# same step is CPU-viable; TPU keeps the native convs (MXU emitters).
CONV_IMPL = _os.environ.get("VD_CONV_IMPL", "auto")

# Trace-time override: mtt.py wraps the SECOND-order (HVP) model apply
# in conv_impl("gemm") on CPU, scoping the gemm lowering to the region
# with the pathology while first-order paths (evals, buffer training,
# DM embeds) keep the fast native convs.
_CONV_OVERRIDE: list = []


class conv_impl:
    """Context manager: force a conv lowering while tracing a region."""

    def __init__(self, mode: str):
        self.mode = mode

    def __enter__(self):
        _CONV_OVERRIDE.append(self.mode)

    def __exit__(self, *exc):
        _CONV_OVERRIDE.pop()


def _conv_mode() -> str:
    if _CONV_OVERRIDE:
        return _CONV_OVERRIDE[-1]
    return CONV_IMPL


def _use_gemm_conv() -> bool:
    mode = _conv_mode()
    # "auto" = native: the gemm lowering only enters through an explicit
    # env or the second-order conv_impl override (mtt.py)
    return mode in ("gemm", "gemmsum")


# Trace-time fp32 dtype islands for the bf16-HVP overflow bisection
# (BASELINE.md "bf16-HVP cost A/B"): mtt.py wraps the second-order model
# apply in fp32_stages((...)) and ConvNet3D casts activations to fp32 at
# the named stage boundaries ("s1", "s2", "s3", "head") and back to the
# compute dtype at the next unnamed one. Boundary casts island BOTH
# directions: a cast's transpose is a cast, so cotangents entering the
# islanded stage's backward are fp32 too. Empty (the default) is a no-op.
_FP32_STAGES: list = []


KNOWN_STAGES = frozenset({"s1", "s2", "s3", "head"})


class fp32_stages:
    """Context manager: cast the named ConvNet3D stages to fp32 while
    tracing a region (overflow-localization islands)."""

    def __init__(self, stages):
        self.stages = tuple(stages)
        unknown = set(self.stages) - KNOWN_STAGES
        if unknown:
            raise ValueError(
                f"unknown fp32 island stage(s) {sorted(unknown)}; "
                f"known: {sorted(KNOWN_STAGES)}")

    def __enter__(self):
        _FP32_STAGES.append(self.stages)

    def __exit__(self, *exc):
        _FP32_STAGES.pop()


def stage_island(x, name: str, base_dtype):
    """Cast x for stage ``name``: fp32 inside an active island, the
    caller's compute dtype outside. Same-dtype casts are free."""
    want = jnp.float32 if (_FP32_STAGES and name in _FP32_STAGES[-1]) \
        else base_dtype
    return x if x.dtype == want else x.astype(want)


def _conv2d(x, w, window_strides, padding):
    """NHWC x HWIO -> NHWC conv with a backend-appropriate lowering."""
    if not _use_gemm_conv():
        return jax.lax.conv_general_dilated(
            x, w, window_strides=window_strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    kh, kw, C, O = w.shape
    sh, sw = window_strides
    if padding != "VALID":
        x = jnp.pad(x, ((0, 0), tuple(padding[0]), tuple(padding[1]),
                        (0, 0)))
    N, H, W, _ = x.shape
    Ho = (H - kh) // sh + 1
    Wo = (W - kw) // sw + 1
    if _conv_mode() == "gemmsum":
        # sum of per-tap dots: no concat, so the x-cotangent is kh*kw
        # fused pad+adds instead of a concat-split
        y = None
        for u in range(kh):
            for v in range(kw):
                s = jax.lax.slice(
                    x, (0, u, v, 0),
                    (N, u + (Ho - 1) * sh + 1, v + (Wo - 1) * sw + 1, C),
                    (1, sh, sw, 1))
                t = jax.lax.dot_general(
                    s, w[u, v], dimension_numbers=(((3,), (0,)), ((), ())))
                y = t if y is None else y + t
        return y
    cols = []
    for u in range(kh):
        for v in range(kw):
            cols.append(jax.lax.slice(
                x, (0, u, v, 0),
                (N, u + (Ho - 1) * sh + 1, v + (Wo - 1) * sw + 1, C),
                (1, sh, sw, 1)))
    patches = jnp.concatenate(cols, axis=-1)  # (N, Ho, Wo, kh*kw*C)
    return jax.lax.dot_general(
        patches, w.reshape(kh * kw * C, O),
        dimension_numbers=(((3,), (0,)), ((), ())))

# Wide-layer (conv2/conv3) stride-2 conv formulation. "direct" = the
# plain stride-2 7x7 conv; "s2d" = stride-1 4x4 conv over a 2x2
# space-to-depth view (see TemporalIm2ColConv) — the conv2-at-48-TF/s
# A/B (full-graph traces only; toggle via env for ab_kernels.py).
WIDE_CONV_MODE = _os.environ.get("VD_WIDE_CONV", "direct")

# tap map for the wide-layer s2d: cell offset d in [0,4), parity p in
# {0,1} -> original tap u = 2d + p, or 7 (zero slot) when u > 6
_UW = np.full((4, 2), 7, np.int32)
for _d in range(4):
    for _p in range(2):
        if 2 * _d + _p <= 6:
            _UW[_d, _p] = 2 * _d + _p


def _s2d_wide_pack(xf):
    """(BF, H, W, C) -> (BF, Hc, Wc, 4C) 2x2 space-to-depth of the
    pad-3 input (odd H/W pad one extra row/col that no valid tap
    reads); cell channel order (py, px, c)."""
    BF, H, W, C = xf.shape
    xp = jnp.pad(xf, ((0, 0), (3, 3 + H % 2), (3, 3 + W % 2), (0, 0)))
    Hc, Wc = (H + 6 + H % 2) // 2, (W + 6 + W % 2) // 2
    return xp.reshape(BF, Hc, 2, Wc, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(BF, Hc, Wc, 4 * C)


def _s2d_wide_kernel(w, dtype):
    """(7, 7, C, O) stride-2 kernel -> (4, 4, 4C, O) stride-1 kernel on
    the s2d view: W4[dy, dx, (py, px, c), o] = w[2dy+py, 2dx+px, c, o]
    (zero beyond tap 6)."""
    w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    wg = w8[_UW[:, :, None, None],
            _UW[None, None, :, :]]  # (dy, py, dx, px, C, O)
    C, O = w.shape[2], w.shape[3]
    return wg.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C,
                                                  O).astype(dtype)


# ---------------------------------------------------------------------------
# Phase-decomposed x-cotangent for the wide-layer stride-2 7x7 conv.
#
# The r5 full-graph trace (BASELINE.md round-5) shows the conv2-family
# DGRAD (k=7x7 s=2, (800,28,28,64)<-(800,14,14,128), parity:
# /root/reference/networks.py:799) at ~149 ms/step = ~50 TF/s = peak/4 —
# the signature of XLA zero-stuffing the lhs_dilation=2 transposed conv
# (4x MACs on zeros) — while fwd (~128 TF/s) and wgrad (~112 TF/s) of the
# SAME family are healthy. ``conv7s2`` is a bilinear primitive whose
# forward/wgrad stay on the native emitters and ONLY the x-cotangent is
# rerouted through an exact 4-parity decomposition: one stride-1 4x4
# VALID conv over the (1,2)-padded cotangent with a (4,4,O,4C)
# zero-slotted kernel, then a 2x2 depth-to-space (1.31x tap inflation,
# zero wasted MACs; numerically verified vs jax.linear_transpose in
# scripts/probe_conv2_dgrad.py and tests/test_conv_phase_dgrad.py).
# Unlike the r4 wide_s2d dead end (which rewrote the FORWARD into s2d
# form and lost on pack/unpack data movement), the forward here is
# byte-identical to the native path.
# ---------------------------------------------------------------------------

# Toggle: "phase" = reroute the x-cotangent, "native" = today's XLA dgrad.
WIDE_DGRAD_MODE = _os.environ.get("VD_WIDE_DGRAD", "native")

# Tap map: input-row parity a with window tap m reads fwd tap
# u = a + 5 - 2m, or the zero slot 7 when out of [0, 7).
_UP = np.full((4, 2), 7, np.int32)  # [m, a]
for _m in range(4):
    for _a in range(2):
        if 0 <= _a + 5 - 2 * _m <= 6:
            _UP[_m, _a] = _a + 5 - 2 * _m


def _phase_dgrad_kernel(w):
    """(7,7,C,O) stride-2 kernel -> (4,4,O,4C) stride-1 dgrad kernel:
    K[m,n,o,(a*2+b)*C+c] = w[a+5-2m, b+5-2n, c, o] (zero out of range)."""
    C, O = w.shape[2], w.shape[3]
    w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    wg = w8[_UP[:, :, None, None], _UP[None, None, :, :]]  # (m,a,n,b,C,O)
    return wg.transpose(0, 2, 5, 1, 3, 4).reshape(4, 4, O, 4 * C)


def _phase_dgrad_apply(cot, kphase, C):
    """cot (B,Ho,Wo,O) -> x_bar (B,2Ho,2Wo,C) via ONE stride-1 conv +
    2x2 depth-to-space."""
    B, Ho, Wo, _ = cot.shape
    cp = jnp.pad(cot, ((0, 0), (1, 2), (1, 2), (0, 0)))
    y = _conv2d(cp, kphase, (1, 1), "VALID")  # (B, Ho, Wo, 4C)
    y = y.reshape(B, Ho, Wo, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, 2 * Ho, 2 * Wo, C)


conv7s2_p = jax.extend.core.Primitive("conv7s2")


def conv7s2(x, w):
    """y = conv(x, w; k=7x7, s=2, p=3), bilinear primitive with the
    phase-decomposed x-transpose. Requires even H, W and x.dtype ==
    w.dtype."""
    assert x.dtype == w.dtype, (x.dtype, w.dtype)
    return conv7s2_p.bind(x, w)


def _conv7s2_impl(x, w):
    return _conv2d(x, w, (2, 2), ((3, 3), (3, 3)))


def _conv7s2_abstract(x, w):
    N, H, W, C = x.shape
    assert w.shape[:2] == (7, 7) and w.shape[2] == C, (x.shape, w.shape)
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    return x.update(shape=(N, H // 2, W // 2, w.shape[3]),
                    weak_type=False)


conv7s2_p.def_abstract_eval(_conv7s2_abstract)
conv7s2_p.def_impl(_conv7s2_impl)
mlir.register_lowering(conv7s2_p, mlir.lower_fun(_conv7s2_impl,
                                                 multiple_results=False))

ad.defjvp(conv7s2_p,
          lambda dx, x, w: conv7s2(dx, w),
          lambda dw, x, w: conv7s2(x, dw))


def _conv7s2_transpose(ct, x, w):
    if ad.is_undefined_primal(x):
        assert not ad.is_undefined_primal(w), \
            "conv7s2 transpose: w must be known for the x-cotangent"
        C = x.aval.shape[3]
        kp = _phase_dgrad_kernel(w).astype(ct.dtype)
        return _phase_dgrad_apply(ct, kp, C), None
    assert not ad.is_undefined_primal(x)
    wbar = jax.linear_transpose(
        lambda ww: _conv2d(x, ww, (2, 2), ((3, 3), (3, 3))),
        jax.ShapeDtypeStruct(w.aval.shape, w.aval.dtype))(ct)[0]
    return None, wbar


ad.primitive_transposes[conv7s2_p] = _conv7s2_transpose


def _conv7s2_batching(args, dims):
    x, w = args
    xd, wd = dims
    if wd is batching.not_mapped:
        x = jnp.moveaxis(x, xd, 0)
        V, N = x.shape[0], x.shape[1]
        out = conv7s2(x.reshape((V * N,) + x.shape[2:]), w)
        return out.reshape((V, N) + out.shape[1:]), 0
    # Mapped weights (the num_eval-vmapped eval scan): no per-net phase
    # form — defer to XLA's own grouped-conv batching of the native conv,
    # exactly today's eval behavior.
    w = jnp.moveaxis(w, wd, 0)
    if xd is batching.not_mapped:
        x = jnp.broadcast_to(x[None], (w.shape[0],) + x.shape)
    else:
        x = jnp.moveaxis(x, xd, 0)
    return jax.vmap(_conv7s2_impl)(x, w), 0


batching.primitive_batchers[conv7s2_p] = _conv7s2_batching


def _wide_conv_s2(xf, w):
    """Wide-layer stride-2 7x7 pad-3 conv; reroutes the x-cotangent
    through the 4-parity phase decomposition when VD_WIDE_DGRAD=phase."""
    w = w.astype(xf.dtype)
    if (WIDE_DGRAD_MODE == "phase" and w.shape[:2] == (7, 7)
            and xf.shape[1] % 2 == 0 and xf.shape[2] % 2 == 0):
        return conv7s2(xf, w)
    return _conv2d(xf, w, (2, 2), ((3, 3), (3, 3)))


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


class TemporalIm2ColConv(nn.Module):
    """Conv3d k=(3,7,7) s=(1,2,2) p=(1,3,3) expressed as a temporal im2col
    (stack the t-1/t/t+1 frames into channels) followed by a 2-D conv.

    Mathematically identical to the direct 3-D convolution (same dot
    products, same torch-default init); on TPU the 3-D backward for a
    3-channel first layer is ~3x slower than this 2-D formulation (XLA's
    conv3d dgrad/wgrad tile poorly at C_in=3), so ConvNet3D's first layer
    uses this. Kernel is stored in DHWIO layout like nn.Conv's so weight
    ports from the torch reference transpose identically.

    When ``fuse_pool`` is set, the layer additionally folds the following
    spatial (2,2) max-pool into the convolution via a 4x4 space-to-depth
    reformulation: conv(s=2) + 2x2 pool == max over the 4 "phase" outputs
    of a stride-4 conv, and with the input space-to-depth'd by 4 each
    phase conv becomes a stride-1 3x3 conv whose taps index into the
    16 packed sub-pixel channels. All four phases are stacked into one
    (3,3,16*3C, 4*O) kernel so the whole first stage is ONE dense
    stride-1 GEMM + a group-max — this deletes the XLA reduce-window
    (5.3 ms on the 321 MB conv1 activation at the miniUCF101 shapes),
    its select-and-scatter backward, and the layout copies around them,
    which together were ~half of the MTT inner-step time on a v5e.
    (Exactness: relu/pool commute with the monotonic max; bias is
    per-output-channel so it commutes with the phase max; the layer
    applies pool-max -> bias (4x cheaper than bias -> pool-max, equal
    up to bf16 rounding of tie candidates) and the caller applies the
    activation after.)
    """

    features: int
    use_bias: bool = True
    fuse_pool: bool = False
    pre_packed: bool = False  # x arrives s2d2_pack'ed (requires fuse_pool)

    @nn.compact
    def __call__(self, x):
        if self.pre_packed:
            # x: (B, F, Hc, Wc, 12C) from s2d2_pack
            assert self.fuse_pool and S2D_POOL_MODE == "s2d2"
            B, F, Hc, Wc, Ck4 = x.shape
            C = Ck4 // 12
            H, W = (Hc - 4) * 2, (Wc - 4) * 2
            fan_in = C * 3 * 7 * 7
            kernel = self.param("kernel", torch_kaiming_uniform(),
                                (3, 7, 7, C, self.features))
            w2 = kernel.transpose(1, 2, 0, 3, 4).reshape(
                7, 7, 3 * C, self.features)
            bias = self.param("bias", torch_bias_uniform(fan_in),
                              (self.features,)) if self.use_bias else None
            y = _s2d2_gemm(x.reshape(B * F, Hc, Wc, Ck4), w2,
                           self.features)
            y = _phase_max(y)
            # per-channel bias commutes with the phase max — adding it
            # AFTER costs 4x less bandwidth
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y.reshape(B, F, H // 4, W // 4, self.features)

        # x: (B, F, H, W, C)
        B, F, H, W, C = x.shape
        fan_in = C * 3 * 7 * 7
        kernel = self.param("kernel", torch_kaiming_uniform(),
                            (3, 7, 7, C, self.features))
        # (3,7,7,C,O) -> (7,7,3*C,O): channel index = t_offset*C + c
        w2 = kernel.transpose(1, 2, 0, 3, 4).reshape(7, 7, 3 * C,
                                                     self.features)
        bias = self.param("bias", torch_bias_uniform(fan_in),
                          (self.features,)) if self.use_bias else None

        if self.fuse_pool:
            assert H % 4 == 0 and W % 4 == 0, (
                "fuse_pool requires H, W divisible by 4")
            fused = {"direct10": _direct10_conv_pool,
                     "s2d2": _s2d2_conv_pool,
                     "s2d4": _s2d4_conv_pool}[S2D_POOL_MODE]
            y = fused(x, w2, self.features)
            y = _phase_max(y)  # phase max == the (2,2) spatial pool
            # per-channel bias commutes with the phase max (4x cheaper
            # added after)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y.reshape(B, F, H // 4, W // 4, self.features)

        if C >= 16 and TEMPORAL_SUM_PATH:
            # wide layers: 3 per-tap 2-D convs + frame-shifted adds.
            # Identical math to the channel-concat im2col, but skips
            # materialising the 3x-wide concat input (and its scatter-add
            # backward) — the temporal mixing becomes cheap shifted adds
            # on the (4x smaller) conv outputs.
            xf = x.reshape(B * F, H, W, C)
            if WIDE_CONV_MODE == "s2d":
                # conv2-at-48-TF/s hypothesis (ROADMAP item 2): express
                # the stride-2 7x7 conv as a stride-1 4x4 conv over a
                # 2x2 space-to-depth view (1.31x tap inflation via one
                # zero parity-slot per axis, vs conv1's 2.05x) — the
                # packed input is shared by all three temporal taps.
                xv = _s2d_wide_pack(xf)
                cs = []
                for dt in range(3):
                    w4 = _s2d_wide_kernel(kernel[dt], xf.dtype)
                    ci = _conv2d(xv, w4, (1, 1), "VALID")
                    cs.append(ci.reshape(B, F, ci.shape[1], ci.shape[2],
                                         self.features))
            else:
                cs = []
                for dt in range(3):
                    ci = _wide_conv_s2(xf, kernel[dt])
                    cs.append(ci.reshape(B, F, ci.shape[1], ci.shape[2],
                                         self.features))
            # y_t = w0*x_{t-1} + w1*x_t + w2*x_{t+1} (zero beyond ends)
            zpad = ((0, 0), (0, 0), (0, 0), (0, 0), (0, 0))
            y = (cs[1]
                 + jnp.pad(cs[0][:, :-1], ((0, 0), (1, 0)) + zpad[2:])
                 + jnp.pad(cs[2][:, 1:], ((0, 0), (0, 1)) + zpad[2:]))
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y

        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xs = jnp.concatenate(
            [xp[:, 0:F], xp[:, 1:F + 1], xp[:, 2:F + 2]], axis=-1)
        xf = xs.reshape(B * F, H, W, 3 * C)
        y = _conv2d(xf, w2.astype(xf.dtype), (2, 2), ((3, 3), (3, 3)))
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y.reshape(B, F, y.shape[1], y.shape[2], self.features)


# phase/tap geometry for the fused 7x7 s2 conv + 2x2 pool: output (i, j)
# of the pooled stage with pool phase a in {0,1} taps original rows
# 4i + 2a - 3 + u (u in [0,7)); in padded (+4) 4x4-cell coordinates that
# is cell i + (2a+1+u)//4, sub-row (2a+1+u) % 4. _U[dc, p, a] inverts the
# map: the original tap index u for kernel cell-offset dc and sub-row p,
# or 7 (a zero slot) when out of range.
_U = np.full((3, 4, 2), 7, np.int32)
for _dc in range(3):
    for _p in range(4):
        for _a in range(2):
            _u = 4 * _dc + _p - (2 * _a + 1)
            if 0 <= _u <= 6:
                _U[_dc, _p, _a] = _u


def _s2d4_conv_pool(x, w2, features: int):
    """(B, F, H, W, C) x (7,7,3C,O) -> (B*F, H/4, W/4, 4, O): the four
    (2,2)-pool-phase outputs of the stride-2 7x7 temporal-im2col conv,
    as one stride-1 3x3 conv over a 4x4 space-to-depth view."""
    B, F, H, W, C = x.shape
    Ck = 3 * C
    O = features
    # kernel: zero-pad a 8th row/col as the invalid-tap slot, then gather
    # into (dcy, py, a, dcx, px, b, Ck, O) and pack to (3,3,16*Ck,4*O)
    w2p = jnp.pad(w2, ((0, 1), (0, 1), (0, 0), (0, 0)))
    Wg = w2p[_U[:, :, :, None, None, None], _U[None, None, None, :, :, :]]
    Ws = Wg.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(3, 3, 16 * Ck, 4 * O)
    # input: temporal im2col on the flat (B*F, H, W, 3C) view, then 4x4
    # space-to-depth with (py, px, c) packing. Keeping every intermediate
    # a low-rank flat tensor matters: an earlier 8-D stack/transpose
    # variant triggered catastrophic XLA layout copies inside the scan.
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xs = jnp.concatenate(
        [xp[:, 0:F], xp[:, 1:F + 1], xp[:, 2:F + 2]], axis=-1)
    xf = xs.reshape(B * F, H, W, Ck)
    xpad = jnp.pad(xf, ((0, 0), (4, 4), (4, 4), (0, 0)))
    Hc, Wc = H // 4 + 2, W // 4 + 2
    xv = xpad.reshape(B * F, Hc, 4, Wc, 4, Ck).transpose(
        0, 1, 3, 2, 4, 5).reshape(B * F, Hc, Wc, 16 * Ck)
    y = _conv2d(xv, Ws.astype(xv.dtype), (1, 1), "VALID")
    return y  # (B*F, H//4, W//4, 4*O), phases as channel blocks


# 2x2-cell variant of the same fused geometry: output (i, j) at pool
# phase a taps original rows 4i + 2a - 3 + u (u in [0,7)); with +4
# padding, cell c covers rows 2c-4/2c-3, so the tap lands in relative
# cell d = (2a+1+u)//2 (window 5, stride 2), sub-row p = (2a+1+u) % 2.
# _U2[d, p, a] inverts: u = 2d + p - 2a - 1, or 7 (zero slot) when out
# of range. 7 valid slots of 10 per axis -> 2.05x tap inflation vs the
# 4x4 packing's 2.9x, with the same (BF, H/4, W/4, 4, O) phase output.
_U2 = np.full((5, 2, 2), 7, np.int32)
for _d in range(5):
    for _p in range(2):
        for _a in range(2):
            _u = 2 * _d + _p - 2 * _a - 1
            if 0 <= _u <= 6:
                _U2[_d, _p, _a] = _u


def s2d2_pack(x):
    """(B, F, H, W, C) -> (B, F, Hc, Wc, 12C) with Hc = H//2 + 4: the
    temporal-im2col (t-1/t/t+1 channel stack) + 2x2 space-to-depth view
    the fused first stage consumes. Slot order: (py, px, dt, c).

    NOTE (measured on the v5e): staging MTT batches pre-packed is a NET
    LOSS and is disabled (mtt.py PACK_AT_STAGING=False). Re-measured
    with the flat phase-max (r3): staged 852 ms/outer device self-time
    vs 810 in-scan — the staged pack chain materialises ~5 intermediates
    AND the 1.7x-larger packed batches inflate scan-slice bytes. A
    strided-slice+concat variant was also measured and is
    catastrophically WORSE (~530 ms/outer): XLA runs stride-2 slices of
    bf16 at 17-39 GB/s — landmine."""
    B, F, H, W, C = x.shape
    Ck = 3 * C
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xs = jnp.concatenate(
        [xp[:, 0:F], xp[:, 1:F + 1], xp[:, 2:F + 2]], axis=-1)
    xf = xs.reshape(B * F, H, W, Ck)
    xpad = jnp.pad(xf, ((0, 0), (4, 4), (4, 4), (0, 0)))
    Hc, Wc = H // 2 + 4, W // 2 + 4
    xv = xpad.reshape(B * F, Hc, 2, Wc, 2, Ck).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, F, Hc, Wc, 4 * Ck)
    return xv


def _s2d2_gemm(xv, w2, features: int):
    """Packed view (B*F, Hc, Wc, 12C) x (7,7,3C,O) -> phase outputs
    (B*F, H/4, W/4, 4, O)."""
    BF, Hc, Wc, Ck4 = xv.shape
    Ck = Ck4 // 4
    O = features
    w2p = jnp.pad(w2, ((0, 1), (0, 1), (0, 0), (0, 0)))
    Wg = w2p[_U2[:, :, :, None, None, None],
             _U2[None, None, None, :, :, :]]
    Ws = Wg.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(5, 5, 4 * Ck, 4 * O)
    y = _conv2d(xv, Ws.astype(xv.dtype), (2, 2), "VALID")
    # output spatial = ((Hc-5)//2+1, (Wc-5)//2+1) = (H//4, W//4); the 4
    # phases stay packed flat as contiguous channel blocks (a*O + o) —
    # _phase_max consumes this layout directly
    return y


# Pack mover selection for the in-scan s2d2 pipeline: "pallas" routes
# s2d2_pack through the one-pass Pallas mover primitive
# (ops/pallas/s2d2_move.py — jvp/transpose-closed, so it serves all the
# MTT autodiff passes); "xla" keeps the reshape/transpose chain.
S2D_PACK_KERNEL = _os.environ.get("VD_PACK_KERNEL", "xla")


def _s2d2_conv_pool(x, w2, features: int):
    """(B, F, H, W, C) x (7,7,3C,O) -> (B*F, H/4, W/4, 4, O): the four
    (2,2)-pool-phase outputs of the stride-2 7x7 temporal-im2col conv,
    as one stride-2 5x5 conv over a 2x2 space-to-depth view."""
    B, F, H, W, C = x.shape
    if S2D_PACK_KERNEL == "pallas":
        from ..ops.pallas.s2d2_move import pack as pallas_pack
        xv = pallas_pack(x)
    else:
        xv = s2d2_pack(x)
    xv = xv.reshape(B * F, H // 2 + 4, W // 2 + 4, 12 * C)
    return _s2d2_gemm(xv, w2, features)


def _direct10_conv_pool(x, w2, features: int):
    """(B, F, H, W, C) x (7,7,3C,O) -> (B*F, H/4, W/4, 4*O): the four
    (2,2)-pool-phase outputs of the stride-2 7x7 temporal-im2col conv,
    as ONE 10x10 stride-4 conv on the un-packed 9-channel input.

    Pool output (i, j) at phase (a, b) is the stride-2 conv at input
    rows 4i + 2a - 3 + u (u in [0,7)), i.e. padded-row offsets
    p = 2a + u in [0, 9) — so scattering w2 into a (10,10,3C,O) block
    per phase and concatenating the four blocks along the output axis
    turns phase extraction into the conv's OWN patch extraction. Tap
    inflation matches s2d2 (4*70/(4*49) = 1.43x per axis => 2.04x), but
    the s2d2 pad/reshape/transpose packing pipeline disappears — it cost
    ~110 ms/outer of pure data formatting across the S2D-MTT autodiff
    passes on a v5e (this formulation measured 2.1x faster end-to-end
    on the fwd+dgrad+wgrad chain)."""
    B, F, H, W, C = x.shape
    Ck = 3 * C
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xs = jnp.concatenate(
        [xp[:, 0:F], xp[:, 1:F + 1], xp[:, 2:F + 2]], axis=-1)
    xf = xs.reshape(B * F, H, W, Ck)
    w10 = jnp.concatenate(
        [jnp.pad(w2, ((2 * a, 3 - 2 * a), (2 * b, 3 - 2 * b),
                      (0, 0), (0, 0)))
         for a in (0, 1) for b in (0, 1)], axis=-1)  # (10,10,Ck,4O)
    y = _conv2d(xf, w10.astype(xf.dtype), (4, 4), ((3, 5), (3, 5)))
    # (B*F, H//4, W//4, 4*O) — phases as contiguous channel blocks in
    # (a, b) row-major order, the layout _phase_max consumes
    return y


def _phase_slices(y):
    O = y.shape[-1] // 4
    return (y[..., 0 * O:1 * O], y[..., 1 * O:2 * O],
            y[..., 2 * O:3 * O], y[..., 3 * O:4 * O])


@jax.custom_jvp
def _phase_max_xla(y):
    """Max over the 4 pool phases packed as contiguous channel blocks of
    (B', Ho, Wo, 4*O) — a pairwise max tree over CONTIGUOUS slices.

    Earlier formulations reshaped to (B', Ho, Wo, 4, O) and reduced axis
    3; on the v5e that 5-D view forced batch-minor layout copies of the
    full conv output (~10 ms each at miniUCF101 shapes), u8/s32 argmax
    materialisation (iota_reduce fusions), and pad+add phase scatters in
    the second-order transpose — ~100 ms/outer of pure glue. The flat
    pairwise tree consumes the GEMM output in its native layout; every
    level is an elementwise maximum of contiguous channel slices that
    XLA fuses into a single pass, and the JVP/transpose are where-chains
    with masks recomputed from the (already-residual) conv output.

    Tie-breaking matches torch's MaxPool2d (gradient to the FIRST
    maximal element in window scan order): phase channel order is
    (a_y, a_x) row-major = the 2x2 window scan order, and where(a >= b)
    prefers the earlier operand at every tree level."""
    y0, y1, y2, y3 = _phase_slices(y)
    return jnp.maximum(jnp.maximum(y0, y1), jnp.maximum(y2, y3))


@_phase_max_xla.defjvp
def _phase_max_jvp(primals, tangents):
    (y,), (t,) = primals, tangents
    y0, y1, y2, y3 = _phase_slices(y)
    t0, t1, t2, t3 = _phase_slices(t)
    m01 = jnp.maximum(y0, y1)
    m23 = jnp.maximum(y2, y3)
    t01 = jnp.where(y0 >= y1, t0, t1)
    t23 = jnp.where(y2 >= y3, t2, t3)
    return (jnp.maximum(m01, m23), jnp.where(m01 >= m23, t01, t23))


# Phase-max kernel selection: "pallas" routes through the phase trio
# (ops/pallas/phase_trio.py) — one fused max+winner-index pass whose
# second-order AD reads a 1-byte index residual instead of recomputing
# masks from the 4x-wide conv output; "xla" keeps the where-chain
# custom-jvp above.
S2D_PHASE_KERNEL = _os.environ.get("VD_PHASE_KERNEL", "xla")


def _phase_max(y):
    if S2D_PHASE_KERNEL == "pallas":
        from ..ops.pallas.phase_trio import phase_max as pallas_phase_max
        return pallas_phase_max(y)
    return _phase_max_xla(y)


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
    torch's floor-division output shape).

    For stride==window pooling the reduction is decomposed into
    successive per-axis pair-maxes (two strided slices + jnp.maximum per
    halving): XLA fuses each into a single pass, while its reduce-window
    kernel runs at a fraction of HBM bandwidth at these shapes and its
    backward lowers to the slower select-and-scatter. (An all-axes-at-
    once slice-max was also tried and regressed — 8-way max trees make
    XLA materialise each slice; pairwise per-axis stays fused.)
    """
    strides = tuple(strides) if strides is not None else tuple(window)
    window = tuple(window)
    if strides == window and all(w in (1, 2) for w in window):
        for axis, w in enumerate(window, start=1):
            if w == 1:
                continue
            n = x.shape[axis] // 2
            lo = [slice(None)] * x.ndim
            hi = [slice(None)] * x.ndim
            lo[axis] = slice(0, 2 * n, 2)
            hi[axis] = slice(1, 2 * n, 2)
            x = jnp.maximum(x[tuple(lo)], x[tuple(hi)])
        return x
    return nn.max_pool(x, window, strides=strides, padding="VALID")


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
