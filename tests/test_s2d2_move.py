"""Pallas s2d2 mover pair vs the XLA reference chain (interpret mode).

The primitive must equal layers.s2d2_pack exactly, and its AD closure
(jvp + transpose, nested to second order like the MTT rof backward) must
match jax.grad through the XLA formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_distillation_tpu.models.layers import s2d2_pack
from video_distillation_tpu.ops.pallas import s2d2_move

B, F, H, W, C = 2, 4, 8, 8, 3


@pytest.fixture(autouse=True)
def _interpret():
    s2d2_move.INTERPRET = True
    yield
    s2d2_move.INTERPRET = False


def _x(seed=0, shape=(B, F, H, W, C)):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def test_pack_matches_xla():
    x = _x()
    np.testing.assert_array_equal(np.asarray(s2d2_move.pack(x)),
                                  np.asarray(s2d2_pack(x)))


def test_pack_batched_matches_xla():
    xs = _x(1, (3, B, F, H, W, C))
    out = jax.vmap(s2d2_move.pack)(xs)
    ref = jax.vmap(s2d2_pack)(xs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_unpack_is_linear_transpose():
    x = _x(2)
    g = _x(3, s2d2_pack(x).shape)
    # <pack(x), g> == <x, unpack_sum(g)> for all x, g
    lhs = jnp.vdot(s2d2_move.pack(x), g)
    rhs = jnp.vdot(x, s2d2_move.unpack_sum(g, H, W))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_grad_matches_xla():
    x = _x(4)
    w = _x(5, s2d2_pack(x).shape)

    def f_pallas(x):
        return jnp.sum(s2d2_move.pack(x) * w ** 2)

    def f_xla(x):
        return jnp.sum(s2d2_pack(x) * w ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(f_pallas)(x)),
                               np.asarray(jax.grad(f_xla)(x)), rtol=1e-5)


def test_second_order_rof_closure():
    """grad-of-jvp (the MTT reverse-over-forward backward) must be
    supported and match the XLA chain."""
    x = _x(6)
    v = _x(7)
    w = _x(8, s2d2_pack(x).shape)

    def make_hvp(pack_fn):
        def loss(x):
            p = pack_fn(x)
            return jnp.sum(jnp.tanh(p * w))

        def hvp_target(x):
            return jax.jvp(loss, (x,), (v,))[1]

        return jax.grad(hvp_target)

    got = make_hvp(s2d2_move.pack)(x)
    ref = make_hvp(s2d2_pack)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)


def test_conv_pool_toggle_equal():
    """The layers.py toggle produces identical fused-stage outputs."""
    from video_distillation_tpu.models import layers

    x = _x(9)
    w2 = _x(10, (7, 7, 3 * C, 8))
    ref = layers._s2d2_conv_pool(x, w2, 8)
    old = layers.S2D_PACK_KERNEL
    layers.S2D_PACK_KERNEL = "pallas"
    try:
        got = layers._s2d2_conv_pool(x, w2, 8)
    finally:
        layers.S2D_PACK_KERNEL = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
