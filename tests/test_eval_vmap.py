"""Vmapped multi-net evaluation must agree in distribution with the
sequential path."""

import jax
import numpy as np

from video_distillation_tpu.data import make_synthetic_video_data
from video_distillation_tpu.distill import EvalConfig, evaluate_many
from video_distillation_tpu.distill.dm import init_synthetic_raw


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
