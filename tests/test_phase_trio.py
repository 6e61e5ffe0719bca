"""Pallas phase trio vs the XLA where-chain formulation (interpret mode):
same values, same torch-MaxPool2d tie-breaking, same first- and
second-order gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_distillation_tpu.models.layers import _phase_max_xla
from video_distillation_tpu.ops.pallas import phase_trio

N, O = 48, 8


@pytest.fixture(autouse=True)
def _interpret():
    phase_trio.INTERPRET = True
    yield
    phase_trio.INTERPRET = False


def _y(seed=0, shape=(N, 4 * O)):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def test_max_matches_xla():
    y = _y()
    np.testing.assert_array_equal(np.asarray(phase_trio.phase_max(y)),
                                  np.asarray(_phase_max_xla(y)))


def test_tie_breaking_first_maximal():
    # all-equal phases must pick index 0; pairwise ties prefer earlier
    y = jnp.ones((4, 4 * O))
    _, idx = phase_trio.phase_argmax(y)
    np.testing.assert_array_equal(np.asarray(idx), 0)
    y = jnp.zeros((1, 4 * O)).at[0, 2 * O:3 * O].set(1.0)  # phase 2 wins
    _, idx = phase_trio.phase_argmax(y)
    np.testing.assert_array_equal(np.asarray(idx[0, :O]), 2)


def test_grad_matches_xla():
    y = _y(1)
    w = _y(2, (N, O))

    for fn in (phase_trio.phase_max, _phase_max_xla):
        g = jax.grad(lambda yy: jnp.sum(fn(yy) * w))(y)
        if fn is phase_trio.phase_max:
            got = g
        else:
            ref = g
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_second_order_rof_closure():
    y0 = _y(3)
    v = _y(4)
    w = _y(5, (N, O))

    def make_hvp(fn):
        def loss(y):
            return jnp.sum(jnp.tanh(fn(y) * w))

        return jax.grad(lambda y: jax.jvp(loss, (y,), (v,))[1])

    got = make_hvp(phase_trio.phase_max)(y0)
    ref = make_hvp(_phase_max_xla)(y0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)


def test_select_scatter_transpose_pair():
    y = _y(6)
    _, idx = phase_trio.phase_argmax(y)
    t = _y(7)
    c = _y(8, (N, O))
    lhs = jnp.vdot(phase_trio.phase_select(t, idx), c)
    rhs = jnp.vdot(t, phase_trio.phase_scatter(c, idx))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-6)


def test_vmap_folds_rows():
    ys = _y(9, (3, N, 4 * O))
    out = jax.vmap(phase_trio.phase_max)(ys)
    ref = jax.vmap(_phase_max_xla)(ys)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_layers_toggle_four_d():
    """The layers._phase_max dispatcher handles the (B', Ho, Wo, 4O)
    conv-output layout identically in both modes."""
    from video_distillation_tpu.models import layers

    y = _y(10, (2, 3, 5, 4 * O))
    ref = layers._phase_max(y)
    old = layers.S2D_PHASE_KERNEL
    layers.S2D_PHASE_KERNEL = "pallas"
    try:
        got = layers._phase_max(y)
    finally:
        layers.S2D_PHASE_KERNEL = old
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
