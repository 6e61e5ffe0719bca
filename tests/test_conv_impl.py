"""The im2col-GEMM conv lowering (layers._conv2d with conv_impl
override) must equal the native lax.conv_general_dilated — values,
first-order grads, and a second-order (grad-of-jvp) probe.

The gemm lowering exists because XLA-CPU emits in-scan stride-2 conv
weight-gradients as rhs-dilated convolutions with no fast path (measured
~20 s for one conv1 wgrad at MTT test shapes); mtt.py routes the MTT
unroll through it on CPU (VD_MTT_CONV=auto)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_distillation_tpu.models import layers
from video_distillation_tpu.models.layers import _conv2d, conv_impl


CASES = [
    # (kh, kw, C, O, stride, padding)
    (5, 5, 12, 16, (2, 2), "VALID"),
    (7, 7, 9, 8, (2, 2), ((3, 3), (3, 3))),
    (10, 10, 9, 16, (4, 4), ((3, 5), (3, 5))),
    (3, 3, 8, 8, (1, 1), "VALID"),
]


@pytest.mark.parametrize("impl", ["gemm", "gemmsum"])
@pytest.mark.parametrize("case", CASES)
def test_gemm_conv_matches_native(impl, case):
    kh, kw, C, O, stride, padding = case
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 20, 18, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(kh, kw, C, O)).astype(np.float32))

    with conv_impl("native"):
        ref = _conv2d(x, w, stride, padding)
    with conv_impl(impl):
        got = _conv2d(x, w, stride, padding)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss(mode, xx, ww):
        with conv_impl(mode):
            return jnp.sum(_conv2d(xx, ww, stride, padding) ** 2)

    # dot-vs-conv accumulation order differs; grads sum many terms
    gx_r, gw_r = jax.grad(loss, argnums=(1, 2))("native", x, w)
    gx_g, gw_g = jax.grad(loss, argnums=(1, 2))(impl, x, w)
    np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_g), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-3)


def test_gemm_conv_second_order_matches_native():
    """grad-of-jvp (the HVP building block) through both lowerings."""
    kh, kw, C, O, stride, padding = CASES[0]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(kh, kw, C, O)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=w.shape).astype(np.float32))

    def hvp(mode):
        def f(ww):
            with conv_impl(mode):
                return jnp.sum(jnp.tanh(_conv2d(x, ww, stride, padding)))

        def jv(ww):
            return jax.jvp(f, (ww,), (v,))[1]

        return jax.grad(jv)(w)

    np.testing.assert_allclose(np.asarray(hvp("gemm")),
                               np.asarray(hvp("native")),
                               rtol=5e-4, atol=5e-4)
