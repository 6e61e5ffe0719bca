"""Differentiable Pallas hallucinator (hal_conv primitive) vs the flax
reference — values, JVPs, and gradients, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_distillation_tpu.models.hallucinator import Hallucinator
from video_distillation_tpu.ops.pallas import hal_vjp


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(hal_vjp, "INTERPRET", True)


B, F, H, W = 2, 4, 16, 16


def _inputs(key):
    static = jax.random.normal(jax.random.fold_in(key, 1), (B, H, W, 3))
    dynamic = jax.random.normal(jax.random.fold_in(key, 2),
                                (B, F, H, W, 1))
    hal = Hallucinator()
    params = hal.init(key, static, dynamic)["params"]
    return hal, params, static, dynamic


def test_forward_matches_flax():
    hal, params, static, dynamic = _inputs(jax.random.PRNGKey(0))
    ref = hal.apply({"params": params}, static, dynamic)
    out = hal_vjp.hal_conv(static, dynamic, params["kernel"],
                           params["bias"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_grads_match_flax():
    hal, params, static, dynamic = _inputs(jax.random.PRNGKey(1))
    cot = jax.random.normal(jax.random.PRNGKey(9), (B, F, H, W, 3))

    def loss_ref(s, d, k, b):
        y = hal.apply({"params": {"kernel": k, "bias": b}}, s, d)
        return jnp.sum(y * cot)

    def loss_pal(s, d, k, b):
        return jnp.sum(hal_vjp.hal_conv(s, d, k, b) * cot)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
        static, dynamic, params["kernel"], params["bias"])
    gp = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(
        static, dynamic, params["kernel"], params["bias"])
    for a, b_, name in zip(gr, gp, ("static", "dynamic", "kernel",
                                    "bias")):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_jvp_matches_flax():
    hal, params, static, dynamic = _inputs(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(3)
    tans = (jax.random.normal(jax.random.fold_in(key, 0), static.shape),
            jax.random.normal(jax.random.fold_in(key, 1), dynamic.shape),
            jax.random.normal(jax.random.fold_in(key, 2),
                              params["kernel"].shape),
            jax.random.normal(jax.random.fold_in(key, 3),
                              params["bias"].shape))

    def f_ref(s, d, k, b):
        return hal.apply({"params": {"kernel": k, "bias": b}}, s, d)

    args = (static, dynamic, params["kernel"], params["bias"])
    _, t_ref = jax.jvp(f_ref, args, tans)
    _, t_pal = jax.jvp(hal_vjp.hal_conv, args, tans)
    np.testing.assert_allclose(np.asarray(t_pal), np.asarray(t_ref),
                               rtol=5e-4, atol=5e-4)


def test_vmap_over_inputs():
    hal, params, static, dynamic = _inputs(jax.random.PRNGKey(5))
    v = 3
    sv = jnp.stack([static + i for i in range(v)])
    dv = jnp.stack([dynamic * (i + 1) for i in range(v)])
    out = jax.vmap(lambda s, d: hal_vjp.hal_conv(
        s, d, params["kernel"], params["bias"]))(sv, dv)
    ref = jnp.stack([hal.apply({"params": params}, sv[i], dv[i])
                     for i in range(v)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_grad_of_dynamic_only_linearized():
    """The MTT shape: frozen static, reverse-mode w.r.t. (dynamic,
    kernel, bias) only — the linearize+transpose path the outer backward
    takes."""
    hal, params, static, dynamic = _inputs(jax.random.PRNGKey(4))

    def loss(d, k, b):
        y = hal_vjp.hal_conv(static, d, k, b)
        return jnp.sum(jnp.sin(y))

    def loss_ref(d, k, b):
        y = hal.apply({"params": {"kernel": k, "bias": b}}, static, d)
        return jnp.sum(jnp.sin(y))

    gp = jax.grad(loss, argnums=(0, 1, 2))(dynamic, params["kernel"],
                                           params["bias"])
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(dynamic, params["kernel"],
                                               params["bias"])
    for a, b_, name in zip(gr, gp, ("dynamic", "kernel", "bias")):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-4, atol=5e-4, err_msg=name)
