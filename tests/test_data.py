"""Data layer tests: sampling rules, packing round-trip, class tables."""

import numpy as np
import pytest

from video_distillation_tpu.data import (ClipStore, load_packed,
                                         make_synthetic_video_data,
                                         sample_start, save_packed)
from video_distillation_tpu.data.store import clip_indices


def test_sample_start_adaptive_skip():
    rng = np.random.default_rng(0)
    # long video: skip == FRAME_GAP == 4 (dataset.py:427-430)
    for _ in range(20):
        start, skip = sample_start(rng, length=200, num_frames=16)
        assert skip == 4
        idx = clip_indices(start, skip, 16)
        assert idx.max() < 200 and len(idx) == 16
    # short video: skip = length // F
    for _ in range(20):
        start, skip = sample_start(rng, length=40, num_frames=16)
        assert skip == 2
        assert clip_indices(start, skip, 16).max() < 40


def test_sample_start_degenerate():
    rng = np.random.default_rng(0)
    start, skip = sample_start(rng, length=17, num_frames=16)
    assert skip == 1 and start == 0


def test_synthetic_roundtrip(tmp_path):
    data = make_synthetic_video_data(num_classes=3, clips_per_class=4,
                                     frames=8, im_size=(16, 16))
    assert data.train.clips.shape == (12, 8, 16, 16, 3)
    save_packed(str(tmp_path / "pack"), data)
    loaded = load_packed(str(tmp_path / "pack"))
    assert loaded.meta.num_classes == 3
    np.testing.assert_array_equal(loaded.train.clips, data.train.clips)
    np.testing.assert_array_equal(loaded.test.offsets, data.test.offsets)


def test_class_table_and_per_class_sampling():
    data = make_synthetic_video_data(num_classes=3, clips_per_class=5)
    table, counts = data.train.class_table()
    assert counts.tolist() == [5, 5, 5]
    rng = np.random.default_rng(1)
    idx = data.train.sample_per_class(rng, 3)
    assert idx.shape == (3, 3)
    for c in range(3):
        assert np.all(data.train.labels[idx[c]] == c)
        assert len(set(idx[c].tolist())) == 3  # without replacement


def test_test_clip_sampling_shapes_and_flip():
    data = make_synthetic_video_data(num_classes=2, test_per_class=3,
                                     frames=8, im_size=(16, 16),
                                     test_video_len=50)
    rng = np.random.default_rng(0)
    clips = data.test.sample_clips(rng)
    assert clips.shape == (6, 8, 16, 16, 3)
    # fresh temporal crops each call
    clips2 = data.test.sample_clips(np.random.default_rng(1))
    assert not np.array_equal(clips, clips2)


def test_normalize():
    import jax.numpy as jnp
    data = make_synthetic_video_data()
    x = jnp.asarray(data.train.clips[:2])
    y = data.train.normalize(x)
    # pixel 128 -> approx (128/255 - mean)/std
    expected = (128 / 255.0 - 0.485) / 0.229
    got = float(data.train.normalize(jnp.full((1, 1, 1, 3), 128,
                                              jnp.uint8))[0, 0, 0, 0])
    assert abs(got - expected) < 1e-5
