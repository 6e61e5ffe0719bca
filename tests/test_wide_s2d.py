"""VD_WIDE_CONV=s2d (stride-1 4x4 conv on a 2x2 space-to-depth view)
must equal the direct stride-2 7x7 wide conv exactly — values and
gradients, even and odd spatial sizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_distillation_tpu.models import layers
from video_distillation_tpu.models.layers import TemporalIm2ColConv


def _run(mode, x, params):
    old = layers.WIDE_CONV_MODE
    layers.WIDE_CONV_MODE = mode
    try:
        mod = TemporalIm2ColConv(features=8)
        return mod.apply({"params": params}, x)
    finally:
        layers.WIDE_CONV_MODE = old


@pytest.mark.parametrize("hw", [(8, 8), (7, 7), (14, 10)])
def test_wide_s2d_matches_direct(hw):
    H, W = hw
    B, F, C = 2, 3, 16  # C >= 16 takes the wide path
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, F, H, W, C)).astype(np.float32))
    mod = TemporalIm2ColConv(features=8)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]

    ref = _run("direct", x, params)
    got = _run("s2d", x, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_wide_s2d_grads_match():
    B, F, H, W, C = 1, 2, 8, 8, 16
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, F, H, W, C)).astype(np.float32))
    mod = TemporalIm2ColConv(features=8)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]

    def loss(mode, params, x):
        return jnp.sum(_run(mode, x, params) ** 2)

    gp_ref, gx_ref = jax.grad(lambda p, xx: loss("direct", p, xx),
                              argnums=(0, 1))(params, x)
    gp_got, gx_got = jax.grad(lambda p, xx: loss("s2d", p, xx),
                              argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp_got["kernel"]),
                               np.asarray(gp_ref["kernel"]),
                               rtol=1e-4, atol=1e-4)
