"""Unit tests: losses, S2D slot rules, coreset selection, FRePo pieces,
config presets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_distillation_tpu.config import get_preset
from video_distillation_tpu.data import make_synthetic_video_data
from video_distillation_tpu.distill.coreset import _herding, _kcenter
from video_distillation_tpu.distill.frepo import frepo_labels, nfr
from video_distillation_tpu.distill.s2d import (S2DConfig, compose_synthetic,
                                                distill_slots, eval_slots,
                                                init_s2d_state)
from video_distillation_tpu.ops.losses import (lb_margin_th, match_loss,
                                               mtt_param_loss)


def test_mtt_param_loss_normalized():
    t0 = jnp.asarray([0.0, 0.0])
    t1 = jnp.asarray([1.0, 1.0])
    loss, pl, pd = mtt_param_loss(t1, t0, t1)
    assert float(loss) == 0.0 and float(pd) == 2.0
    loss, _, _ = mtt_param_loss(t0, t0, t1)
    assert float(loss) == 1.0  # no progress => normalized loss 1


def test_match_loss_metrics():
    g1 = {"w": jnp.ones((4, 3, 2, 2)), "b": jnp.ones((4,))}
    g2 = {"w": jnp.ones((4, 3, 2, 2)) * 2, "b": jnp.zeros((4,))}
    # cosine-based 'ours': parallel weights -> 0 distance; 1-D leaves ignored
    assert float(match_loss(g1, g2, "ours")) < 1e-5
    assert float(match_loss(g1, g1, "mse")) == 0.0
    assert float(match_loss(g1, g1, "cos")) < 1e-6


def test_lb_margin_th():
    logits = jnp.asarray([[5.0, 1.0, 0.0], [0.6, 0.5, 0.4]])
    m = lb_margin_th(logits)
    # margin capped at 1/dim = 1/3
    assert abs(float(m[0]) + 1 / 3) < 1e-6
    assert abs(float(m[1]) + 0.1) < 1e-5


def test_distill_slots_ranges():
    key = jax.random.PRNGKey(0)
    n, C, spc, vpc = 20, 5, 10, 5
    idx = jnp.arange(n)
    label, s_idx, d_idx = distill_slots(key, C, spc, vpc, n, idx)
    assert np.all(np.asarray(label) == np.asarray(idx) // vpc)
    s = np.asarray(s_idx)
    lab = np.asarray(label)
    assert np.all(s >= lab * spc) and np.all(s < (lab + 1) * spc)
    d = np.asarray(d_idx)
    assert np.all(d >= 0) and np.all(d < 2 * vpc)


def test_eval_slots_vpc5_and_vpc1():
    key = jax.random.PRNGKey(1)
    label, s, d, h = eval_slots(key, num_classes=4, spc=10, dpc=10, n_hal=2)
    assert label.shape == (20,)
    assert np.all(np.asarray(s) // 10 == np.asarray(label))
    label, s, d, h = eval_slots(key, num_classes=4, spc=2, dpc=3, n_hal=1)
    assert label.shape == (4,)
    assert np.all(np.asarray(d) < 3)
    with pytest.raises(ValueError):
        eval_slots(key, 4, spc=7, dpc=1, n_hal=1)


def test_compose_synthetic_shapes():
    cfg = S2DConfig(num_classes=3, spc=2, dpc=2, vpc=1, n_hal=2, frames=4,
                    im_size=(16, 16))
    state = init_s2d_state(jax.random.PRNGKey(0), cfg)
    videos, labels = compose_synthetic(jax.random.PRNGKey(1), state, cfg,
                                       for_eval=True)
    assert videos.shape == (3, 4, 16, 16, 3)
    assert np.all(np.asarray(labels) == np.arange(3))


def test_kcenter_and_herding_selection():
    rng = np.random.default_rng(0)
    # three tight clusters; k-center with k=3 should hit all clusters
    centers = np.array([[0, 0], [10, 0], [0, 10]], np.float32)
    feats = np.concatenate([c + 0.1 * rng.standard_normal((5, 2))
                            for c in centers]).astype(np.float32)
    sel = _kcenter(feats, 3)
    assert len(set(np.asarray(sel) // 5)) == 3
    sel = _herding(feats, 6)
    assert len(sel) == len(set(sel)) == 6


def test_frepo_labels_and_nfr_exact_interpolation():
    y = frepo_labels(np.array([0, 1, 2]), 3)
    assert np.allclose(y.sum(-1), 0, atol=1e-6)
    # KRR with targets == prototypes reproduces prototype labels (reg -> 0)
    feat = jnp.asarray(np.random.default_rng(0).normal(size=(3, 8)),
                       jnp.float32)
    yp = jnp.asarray(y)
    pred = nfr(feat, feat, yp, reg=1e-9)
    assert np.allclose(np.asarray(pred), np.asarray(yp), atol=1e-3)


def test_presets():
    p = get_preset("s2d_MTT_ms_5")
    assert p.spc == 10 and p.vpc == 5 and p.syn_steps == 5
    assert p.batch_syn == 128
    k = get_preset("s2d_MTT_ms_K400")
    assert k.frames == 8 and k.eval_mode == "top5"
    b = get_preset("buffer")
    assert b.num_experts == 30 and b.lr_teacher == 0.01
    with pytest.raises(KeyError):
        get_preset("nope")


def test_mtt_second_order_rof_matches_remat():
    """The reverse-over-forward custom-VJP inner step (default) must
    produce the same outer gradients as the remat reverse-over-reverse
    path it replaced (mtt.py _build_mtt_core)."""
    from video_distillation_tpu.distill.mtt import (_build_mtt_core,
                                                    flat_param_template)

    nc, F, im, S, B = 3, 8, (64, 64), 2, 6
    _, _, f0, _ = flat_param_template("ConvNet3D", 3, nc, im, F, seed=0)
    _, _, f1, _ = flat_param_template("ConvNet3D", 3, nc, im, F, seed=1)
    k = jax.random.PRNGKey(0)
    bx = jax.random.normal(jax.random.PRNGKey(2),
                           (S, B, F, im[0], im[1], 3)) * 0.1
    by = jax.random.randint(jax.random.PRNGKey(3), (S, B), 0, nc)
    bw = jnp.ones((S, B))
    lr = jnp.asarray(0.02)

    outs = {}
    for mode in ("rof", "remat"):
        unr = _build_mtt_core("ConvNet3D", 3, nc, im, F, S, "float32", mode)

        def loss(bx, lr, unr=unr):
            return unr(jnp.asarray(f0), jnp.asarray(f1), lr, bx, by, bw,
                       k)[0]

        v, (gx, glr) = jax.jit(
            jax.value_and_grad(loss, argnums=(0, 1)))(bx, lr)
        outs[mode] = (np.asarray(v), np.asarray(gx), np.asarray(glr))

    v_r, gx_r, glr_r = outs["rof"]
    v_m, gx_m, glr_m = outs["remat"]
    assert abs(v_r - v_m) < 1e-6
    assert np.linalg.norm(gx_r - gx_m) / np.linalg.norm(gx_m) < 1e-5
    assert abs(glr_r - glr_m) / abs(glr_m) < 1e-5


def test_standardize_bf16_matches_fp32():
    """DM bf16 standardization (r5): the all-bf16 chain must agree with
    the fp32-standardize-then-cast chain to within one bf16 ulp of the
    subtract (u8 values are exact in bf16; the divide becomes a
    reciprocal multiply)."""
    from video_distillation_tpu.distill.dm import _standardize

    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.integers(0, 256, (4, 2, 8, 8, 3), dtype=np.uint8))
    mean = jnp.asarray([0.43, 0.42, 0.39], jnp.float32) * 255.0
    std = jnp.asarray([0.15, 0.15, 0.15], jnp.float32) * 255.0

    ref = np.asarray(_standardize(r, mean, std, jnp.float32),
                     dtype=np.float32)
    out = np.asarray(_standardize(r, mean, std, jnp.bfloat16).astype(
        jnp.float32))
    assert out.dtype == np.float32
    # values span ~[-3, 4]; one bf16 ulp at that scale is ~0.03
    assert np.max(np.abs(out - ref)) < 0.06
