"""PNG grid visualization of distilled sets (reference capability:
FRePo/lib/datadistillation/utils.py:40-118)."""

import os

import numpy as np

from video_distillation_tpu.utils.visualize import (save_image_grid,
                                                    save_s2d_grids,
                                                    save_video_grid,
                                                    scale_for_vis)


def test_scale_for_vis_denormalize():
    mean, std = (0.4, 0.4, 0.4), (0.2, 0.2, 0.2)
    x = np.zeros((2, 4, 4, 3), np.float32)  # normalized space
    out = scale_for_vis(x, mean, std)
    np.testing.assert_allclose(out, 0.4, atol=1e-6)
    # without stats: the reference's std-rescale, clipped to [0, 1]
    r = scale_for_vis(np.random.default_rng(0).normal(size=(8, 8)))
    assert r.min() >= 0.0 and r.max() <= 1.0


def test_image_and_video_grids(tmp_path):
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(7, 16, 16, 3)).astype(np.float32)
    p1 = save_image_grid(str(tmp_path / "imgs.png"), imgs, ncol=4)
    vids = rng.normal(size=(3, 8, 16, 16, 3)).astype(np.float32)
    p2 = save_video_grid(str(tmp_path / "vids.png"), vids, max_frames=4)
    from PIL import Image

    g1 = Image.open(p1)
    # 4 cols x 2 rows of 16px cells + 2px padding
    assert g1.size == (4 * 18 + 2, 2 * 18 + 2)
    g2 = Image.open(p2)
    assert g2.size == (4 * 18 + 2, 3 * 18 + 2)  # 4 frames x 3 clips


def test_s2d_grids(tmp_path):
    rng = np.random.default_rng(2)
    static = rng.normal(size=(4, 16, 16, 3))
    dynamic = rng.normal(size=(2, 2, 8, 16, 16, 1))
    videos = rng.normal(size=(2, 8, 16, 16, 3))
    paths = save_s2d_grids(str(tmp_path), 123, static=static,
                           dynamic=dynamic, videos=videos,
                           mean=(0.4,) * 3, std=(0.2,) * 3)
    assert len(paths) == 3
    for p in paths:
        assert os.path.exists(p) and p.endswith(".png")
    assert "static_000123" in paths[0]
