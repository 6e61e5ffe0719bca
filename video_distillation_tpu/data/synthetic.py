"""Synthetic random datasets for tests and benchmarks.

The reference has no test fixtures; we follow SURVEY.md §4's plan: a tiny
random-frame video dataset drives end-to-end DM/MTT/S2D smoke tests in
minutes on CPU.
"""

from __future__ import annotations

import numpy as np

from .meta import DatasetMeta, IMAGENET_MEAN, IMAGENET_STD, register_meta
from .store import ClipStore, RaggedFrameStore, VideoData


def make_synthetic_video_data(num_classes: int = 3, clips_per_class: int = 6,
                              test_per_class: int = 4, frames: int = 8,
                              im_size=(64, 64), test_video_len: int = 40,
                              seed: int = 0,
                              name: str = "synthetic") -> VideoData:
    rng = np.random.default_rng(seed)
    meta = DatasetMeta(name=name, channel=3, im_size=tuple(im_size),
                       num_classes=num_classes, mean=IMAGENET_MEAN,
                       std=IMAGENET_STD, frames=frames)
    register_meta(meta)

    h, w = im_size
    n_train = num_classes * clips_per_class
    # class-dependent mean so distillation/eval have signal to find
    class_mu = rng.integers(40, 215, size=(num_classes, 3))

    def make_clip(c, f):
        base = class_mu[c][None, None, None, :] + rng.normal(
            0, 30, size=(f, h, w, 3))
        return np.clip(base, 0, 255).astype(np.uint8)

    train_clips = np.stack([
        make_clip(c, frames) for c in range(num_classes)
        for _ in range(clips_per_class)
    ])
    train_labels = np.repeat(np.arange(num_classes), clips_per_class)

    n_test = num_classes * test_per_class
    test_videos = [make_clip(c, test_video_len) for c in range(num_classes)
                   for _ in range(test_per_class)]
    offsets = np.zeros(n_test + 1, np.int64)
    offsets[1:] = np.cumsum([v.shape[0] for v in test_videos])
    test_frames = np.concatenate(test_videos, axis=0)
    test_labels = np.repeat(np.arange(num_classes), test_per_class)

    return VideoData(
        meta=meta,
        train=ClipStore(train_clips, train_labels, meta),
        test=RaggedFrameStore(test_frames, offsets,
                              test_labels.astype(np.int32), meta),
    )
