"""conv7s2 primitive (phase-decomposed x-cotangent for the wide-layer
stride-2 7x7 conv) vs the native lowering — values, first-order grads,
vmap (x-only and per-net weights), and the second-order HVP closure the
MTT reverse-over-forward backward needs. CPU, fp32.

Diagnosis + geometry: BASELINE.md round-5 / scripts/probe_conv2_dgrad.py
(parity target: the conv2 stage of /root/reference/networks.py:799).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_distillation_tpu.models import layers

B, H, W, C, O = 2, 12, 16, 5, 7


def _inputs(seed=0):
    kx, kw, kc = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(kx, (B, H, W, C), jnp.float32)
    w = jax.random.normal(kw, (7, 7, C, O), jnp.float32) * 0.2
    cot = jax.random.normal(kc, (B, H // 2, W // 2, O), jnp.float32)
    return x, w, cot


def _native(x, w):
    return layers._conv2d(x, w, (2, 2), ((3, 3), (3, 3)))


def test_forward_matches_native():
    x, w, _ = _inputs()
    np.testing.assert_allclose(np.asarray(layers.conv7s2(x, w)),
                               np.asarray(_native(x, w)),
                               rtol=1e-5, atol=1e-5)


def test_first_order_grads_match():
    x, w, cot = _inputs(1)
    gx_n, gw_n = jax.grad(
        lambda xx, ww: jnp.sum(_native(xx, ww) * cot), (0, 1))(x, w)
    gx_p, gw_p = jax.grad(
        lambda xx, ww: jnp.sum(layers.conv7s2(xx, ww) * cot), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_n),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_n),
                               rtol=1e-4, atol=1e-4)


def test_vmap_x_only():
    x, w, _ = _inputs(2)
    xs = jnp.stack([x, x * 2.0, x - 1.0])
    got = jax.vmap(lambda xx: layers.conv7s2(xx, w))(xs)
    ref = jax.vmap(lambda xx: _native(xx, w))(xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_vmap_per_net_weights():
    # the num_eval-vmapped eval scan maps BOTH x and w over nets
    x, w, _ = _inputs(3)
    xs = jnp.stack([x, x + 0.5])
    ws = jnp.stack([w, w * 0.7])
    got = jax.vmap(layers.conv7s2)(xs, ws)
    ref = jax.vmap(_native)(xs, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and its grads (eval backprops through the conv)
    gn = jax.grad(lambda ww: jnp.sum(jax.vmap(_native)(xs, ww) ** 2))(ws)
    gp = jax.grad(
        lambda ww: jnp.sum(jax.vmap(layers.conv7s2)(xs, ww) ** 2))(ws)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gn),
                               rtol=1e-4, atol=1e-4)


def test_second_order_hvp_matches():
    """Reverse-over-forward closure: d/dw [grad_w loss(w)] . v — the
    exact AD composition the MTT outer backward runs over the unroll."""
    x, w, _ = _inputs(4)
    v = jax.random.normal(jax.random.PRNGKey(9), w.shape) * 0.1
    tgt = jax.random.normal(jax.random.PRNGKey(10), (B, H // 2, W // 2, O))

    def make_hvp(conv):
        def loss(ww):
            y = conv(x, ww)
            return jnp.sum((jnp.tanh(y) - tgt) ** 2)

        def hvp(ww):
            return jax.jvp(jax.grad(loss), (ww,), (v,))[1]

        return hvp

    hn = make_hvp(_native)(w)
    hp = make_hvp(layers.conv7s2)(w)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hn),
                               rtol=2e-4, atol=2e-4)


def test_second_order_through_unroll_input_side():
    """HVP w.r.t. the conv INPUT (the synthetic-data side of MTT): the
    x-cotangent path (phase dgrad) must itself transpose and jvp."""
    x, w, _ = _inputs(5)
    v = jax.random.normal(jax.random.PRNGKey(11), x.shape) * 0.1

    def make_hvp(conv):
        def loss(xx):
            return jnp.sum(jnp.tanh(conv(xx, w)) ** 2)

        def hvp(xx):
            return jax.jvp(jax.grad(loss), (xx,), (v,))[1]

        return hvp

    np.testing.assert_allclose(
        np.asarray(make_hvp(layers.conv7s2)(x)),
        np.asarray(make_hvp(_native)(x)), rtol=2e-4, atol=2e-4)


def test_wide_branch_toggle(monkeypatch):
    """TemporalIm2ColConv wide path under VD_WIDE_DGRAD=phase produces
    the same values and grads as the native mode."""
    from video_distillation_tpu.models.layers import TemporalIm2ColConv

    Bv, F, Hv, Wv, Cv = 2, 3, 8, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(6), (Bv, F, Hv, Wv, Cv))
    mod = TemporalIm2ColConv(features=4)
    params = mod.init(jax.random.PRNGKey(7), x)

    def loss(p, xx):
        return jnp.sum(mod.apply(p, xx) ** 2)

    monkeypatch.setattr(layers, "WIDE_DGRAD_MODE", "native")
    ref_y = mod.apply(params, x)
    ref_g = jax.grad(loss, (0, 1))(params, x)
    monkeypatch.setattr(layers, "WIDE_DGRAD_MODE", "phase")
    got_y = mod.apply(params, x)
    got_g = jax.grad(loss, (0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(got_g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_gemm_lowering_parity():
    """Under the CPU second-order conv_impl('gemm') override the
    primitive and its transposes stay slices/dot_general and agree."""
    x, w, cot = _inputs(8)
    with layers.conv_impl("gemm"):
        y = layers.conv7s2(x, w)
        gx = jax.grad(
            lambda xx: jnp.sum(layers.conv7s2(xx, w) * cot))(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_native(x, w)),
                               rtol=1e-5, atol=1e-5)
    gx_ref = jax.grad(lambda xx: jnp.sum(_native(xx, w) * cot))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
