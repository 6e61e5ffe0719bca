"""Pallas fused hallucinator vs the flax reference (interpret mode on
CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_distillation_tpu.models.hallucinator import Hallucinator
from video_distillation_tpu.ops.pallas import hallucinate_fused_from_params


def test_fused_matches_flax_conv():
    b, f, h, w = 2, 8, 16, 16
    key = jax.random.PRNGKey(0)
    hal = Hallucinator()
    static = jax.random.normal(jax.random.fold_in(key, 1), (b, h, w, 3))
    dynamic = jax.random.normal(jax.random.fold_in(key, 2), (b, f, h, w, 1))
    params = hal.init(key, static, dynamic)["params"]
    ref = hal.apply({"params": params}, static, dynamic)
    fused = hallucinate_fused_from_params(params, static, dynamic,
                                          interpret=True)
    assert fused.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
