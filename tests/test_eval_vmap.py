"""Vmapped multi-net evaluation must agree in distribution with the
sequential path."""

import jax
import numpy as np
import pytest

from video_distillation_tpu.data import make_synthetic_video_data
from video_distillation_tpu.distill import EvalConfig, evaluate_many
from video_distillation_tpu.distill.dm import init_synthetic_raw


@pytest.mark.slow
def test_vmapped_eval_matches_sequential_shapes():
    data = make_synthetic_video_data(num_classes=3, clips_per_class=6,
                                     test_per_class=4, frames=8,
                                     im_size=(64, 64), seed=0,
                                     name="vmap-tiny")
    syn, labels = init_synthetic_raw(jax.random.PRNGKey(0), data.train,
                                     ipc=2, frames=8, init="real")
    cfg = EvalConfig(model="ConvNet3D", epoch_eval_train=15, lr_net=0.003,
                     batch_train=32)
    results, mean, std = evaluate_many(
        jax.random.PRNGKey(7), 2, syn, labels, data, cfg,
        np.random.default_rng(0), vmap_eval=True)
    assert len(results) == 2
    assert 0.0 <= mean <= 1.0 and std >= 0.0
    for r in results:
        assert r.acc_per_class.shape == (3,)
        assert np.isfinite(r.top1)
    # the toy set is separable: vmapped training should learn it
    assert mean > 0.5


@pytest.mark.slow
def test_vmapped_s2d_eval_matches_sequential():
    """mode='multi-static' (the flagship S2D preset) must run vmapped and
    agree with the sequential path in distribution."""
    from video_distillation_tpu.distill.s2d import S2DConfig, init_s2d_state

    data = make_synthetic_video_data(num_classes=3, clips_per_class=6,
                                     test_per_class=4, frames=8,
                                     im_size=(64, 64), seed=0,
                                     name="vmap-tiny")
    s2d_cfg = S2DConfig(num_classes=3, spc=2, dpc=2, vpc=1, n_hal=1,
                        frames=8, im_size=(64, 64))
    state = init_s2d_state(jax.random.PRNGKey(1), s2d_cfg)
    cfg = EvalConfig(model="ConvNet3D", epoch_eval_train=8, lr_net=0.003,
                     batch_train=32, mode="multi-static")
    res_v, mean_v, std_v = evaluate_many(
        jax.random.PRNGKey(7), 2, None, None, data, cfg,
        np.random.default_rng(0), s2d_cfg=s2d_cfg, s2d_state=state,
        vmap_eval=True)
    assert len(res_v) == 2
    assert 0.0 <= mean_v <= 1.0 and np.isfinite(mean_v)
    res_s, mean_s, _ = evaluate_many(
        jax.random.PRNGKey(7), 2, None, None, data, cfg,
        np.random.default_rng(0), s2d_cfg=s2d_cfg, s2d_state=state,
        vmap_eval=False)
    # random-init synthetic memories: both paths should sit near chance,
    # i.e. the same protocol distribution (loose band, not exact equality —
    # the vmapped path shares test-crop draws)
    assert abs(mean_v - mean_s) < 0.45
