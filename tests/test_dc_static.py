"""DC gradient-matching + static-learning pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np

from video_distillation_tpu.data import make_synthetic_video_data
from video_distillation_tpu.distill.dc import get_loops, make_dc_trainer
from video_distillation_tpu.distill.dm import init_synthetic_raw
from video_distillation_tpu.drivers.distill_static import \
    to_single_frame_store


def test_get_loops():
    assert get_loops(1) == (1, 1)
    assert get_loops(10) == (10, 50)
    assert get_loops(50) == (50, 10)


def test_single_frame_store_and_dc_step():
    data = make_synthetic_video_data(num_classes=3, clips_per_class=5,
                                     frames=4, im_size=(32, 32),
                                     name="dc-tiny")
    rng = np.random.default_rng(0)
    singles = to_single_frame_store(data.train, rng)
    assert singles.clips.shape == (15, 32, 32, 3)
    assert singles.meta.frames == 1

    key = jax.random.PRNGKey(0)
    syn, labels = init_synthetic_raw(key, singles, 1, 1, "noise", rng)
    syn = syn.reshape((syn.shape[0],) + syn.shape[2:])
    mom = jnp.zeros_like(syn)
    trainer = make_dc_trainer(singles, "ConvNet", 1, batch_real=4,
                              lr_img=0.1, lr_net=0.01)
    losses = []
    for it in range(3):
        syn, mom, loss = trainer(jax.random.fold_in(key, it), syn, labels,
                                 mom, rng)
        losses.append(loss)
    assert all(np.isfinite(losses))
    assert not np.allclose(np.asarray(mom), 0)
