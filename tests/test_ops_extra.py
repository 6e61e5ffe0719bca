"""ZCA, EMA/AVG, image-dataset store, raw FRePo tests."""

import jax
import jax.numpy as jnp
import numpy as np

from video_distillation_tpu.data.image_datasets import from_arrays
from video_distillation_tpu.distill.frepo import (FRePoConfig,
                                                  make_frepo_trainer)
from video_distillation_tpu.ops.ema import AVGState, EMAState
from video_distillation_tpu.ops.zca import apply_zca, fit_zca, invert_zca


def test_zca_roundtrip_and_decorrelation():
    rng = np.random.default_rng(0)
    # correlated 2-channel data
    base = rng.normal(size=(500, 4, 4, 1))
    x = np.concatenate([base, base * 0.9 + 0.1 * rng.normal(
        size=base.shape)], axis=-1).astype(np.float32)
    state = fit_zca(x, reg=0.001)
    w = apply_zca(state, jnp.asarray(x))
    back = invert_zca(state, w)
    assert np.allclose(np.asarray(back), x, atol=1e-3)
    raw_cov = np.cov(x.reshape(500, -1).T)
    raw_off = np.abs(raw_cov - np.diag(np.diag(raw_cov))).max()
    flat = np.asarray(w).reshape(500, -1)
    cov = np.cov(flat.T)
    off = np.abs(cov - np.diag(np.diag(cov))).max()
    # whitening shrinks cross-correlations dramatically (regularisation
    # keeps it from being exactly 0 — matching the reference's reg term)
    assert off < 0.2 * raw_off


def test_ema_and_avg():
    p = {"w": jnp.ones(3)}
    ema = EMAState.init(p, decay=0.9)
    for _ in range(5):
        ema = ema.update(p)
    np.testing.assert_allclose(np.asarray(ema.value()["w"]), 1.0,
                               rtol=1e-5)
    avg = AVGState.init(p)
    avg = avg.update({"w": jnp.zeros(3)})
    avg = avg.update({"w": jnp.ones(3) * 2})
    np.testing.assert_allclose(np.asarray(avg.value()["w"]), 1.0)


def test_image_store_and_raw_frepo():
    rng = np.random.default_rng(0)
    C = 3
    mu = rng.integers(40, 215, size=(C, 3))
    xtr = np.clip(mu[np.repeat(np.arange(C), 8)][:, None, None, :] +
                  rng.normal(0, 25, (C * 8, 32, 32, 3)), 0,
                  255).astype(np.uint8)
    ytr = np.repeat(np.arange(C), 8)
    xte = np.clip(mu[np.repeat(np.arange(C), 4)][:, None, None, :] +
                  rng.normal(0, 25, (C * 4, 32, 32, 3)), 0,
                  255).astype(np.uint8)
    yte = np.repeat(np.arange(C), 4)
    # reuse CIFAR10 meta shape-wise (32x32x3); override class count via
    # a custom registered meta
    from video_distillation_tpu.data.meta import (DatasetMeta,
                                                  register_meta)
    register_meta(DatasetMeta("img-tiny", 3, (32, 32), C,
                              (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)))
    data = from_arrays("img-tiny", xtr, ytr, xte, yte)
    assert data.train.clips.shape == (24, 32, 32, 3)
    clips = data.test.sample_clips(np.random.default_rng(0), flip=False)
    assert clips.shape == (12, 1, 32, 32, 3)

    cfg = FRePoConfig(num_classes=C, ppc=2, dpc=1, frames=1,
                      im_size=(32, 32), num_nn_state=2,
                      max_online_updates=5, Iteration=10, batch_real=8,
                      lr_d=1.0, lr_h=1e-3, lr_net=1e-3, s2d=False)
    carry, step, pool, compose_eval = make_frepo_trainer(
        data.train, "ConvNet", cfg, jax.random.PRNGKey(0))
    np_rng = np.random.default_rng(0)
    for it in range(3):
        carry, metrics = step(jax.random.fold_in(jax.random.PRNGKey(1), it),
                              carry, np_rng)
        assert np.isfinite(metrics["loss"])
    x_syn = compose_eval(jax.random.PRNGKey(2), carry[0])
    assert x_syn.shape == (6, 32, 32, 3)
