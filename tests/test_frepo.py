"""FRePo trainer smoke test + checkpoint round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from video_distillation_tpu.data import make_synthetic_video_data
from video_distillation_tpu.distill.frepo import (FRePoConfig,
                                                  make_frepo_trainer)
from video_distillation_tpu.utils.checkpoint import (restore_state,
                                                     save_state)


def test_frepo_trainer_steps():
    data = make_synthetic_video_data(num_classes=3, clips_per_class=6,
                                     frames=8, im_size=(64, 64),
                                     name="frepo-tiny")
    cfg = FRePoConfig(num_classes=3, ppc=1, dpc=1, frames=8,
                      im_size=(64, 64), num_nn_state=2,
                      max_online_updates=5, Iteration=10, batch_real=8,
                      lr_d=1.0, lr_h=1e-3, lr_net=1e-3)
    carry, step, pool, compose_eval = make_frepo_trainer(
        data.train, "ConvNet3D", cfg, jax.random.PRNGKey(0))
    np_rng = np.random.default_rng(0)
    losses = []
    for it in range(6):
        carry, metrics = step(jax.random.fold_in(jax.random.PRNGKey(1), it),
                              carry, np_rng)
        losses.append(metrics["loss"])
    assert all(np.isfinite(losses))
    # pool resets after max_online_updates
    assert all(el["step"] < cfg.max_online_updates
               for el in pool.elements)
    x_syn = compose_eval(jax.random.PRNGKey(2), carry[0])
    assert x_syn.shape == (3, 8, 64, 64, 3)


def test_checkpoint_roundtrip(tmp_path):
    state = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 2))}}
    rng = np.random.default_rng(42)
    rng.random(3)
    save_state(str(tmp_path / "ck"), state, step=7, host_rng=rng)
    out = restore_state(str(tmp_path / "ck"), state)
    assert out is not None
    restored, step, rng_state = out
    assert step == 7
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.arange(5.0))
    # host RNG resumes identically
    rng2 = np.random.default_rng()
    rng2.bit_generator.state = rng_state
    assert rng2.random() == rng.random()
