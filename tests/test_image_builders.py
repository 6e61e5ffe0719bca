"""Builders for the FRePo image sets (imagenette/imagewoof/tiny-imagenet)
+ the preprocessed-shard (tfrecord-equivalent) write path."""

import os
import os.path as osp

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from video_distillation_tpu.data.image_datasets import (
    _IMAGENETTE_WNIDS, load_imagenette, load_preprocessed_shards,
    load_tiny_imagenet, write_preprocessed_shards)


def _write_jpegs(d, n, size, value):
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        arr = np.full((size, size, 3), value, np.uint8)
        Image.fromarray(arr).save(osp.join(d, f"img_{i:03d}.JPEG"))


def test_imagenette_builder(tmp_path):
    root = str(tmp_path)
    for split, n in (("train", 3), ("val", 2)):
        for ci, wnid in enumerate(_IMAGENETTE_WNIDS[:4]):
            _write_jpegs(osp.join(root, split, wnid), n, 16, 10 * ci + 5)
    data = load_imagenette(root)
    assert data.train.clips.shape == (12, 128, 128, 3)
    assert data.test.frames.shape[0] == 8
    assert data.meta.num_classes == 10
    # labels follow sorted wnid order; pixel value encodes the class
    for i in range(12):
        c = int(data.train.labels[i])
        assert data.train.clips[i, 0, 0, 0] == 10 * c + 5


def test_tiny_imagenet_builder(tmp_path):
    root = str(tmp_path)
    wnids = [f"n{i:08d}" for i in range(3)]
    with open(osp.join(root, "wnids.txt"), "w") as f:
        f.write("\n".join(wnids))
    for ci, wnid in enumerate(wnids):
        _write_jpegs(osp.join(root, "train", wnid, "images"), 2, 64,
                     20 * ci + 3)
    os.makedirs(osp.join(root, "val", "images"))
    lines = []
    for i, wnid in enumerate(wnids):
        fn = f"val_{i}.JPEG"
        Image.fromarray(np.full((64, 64, 3), 20 * i + 3, np.uint8)).save(
            osp.join(root, "val", "images", fn))
        lines.append(f"{fn}\t{wnid}\t0\t0\t0\t0")
    with open(osp.join(root, "val", "val_annotations.txt"), "w") as f:
        f.write("\n".join(lines))

    data = load_tiny_imagenet(root)
    assert data.train.clips.shape == (6, 64, 64, 3)
    assert data.test.frames.shape == (3, 64, 64, 3)
    for i in range(6):
        c = int(data.train.labels[i])
        assert data.train.clips[i, 0, 0, 0] == 20 * c + 3


def test_imagenet_loader(tmp_path):
    """Full-ImageNet loader over a fabricated imagenet_64x64 tree
    (utils.py:105-131): sorted-wnid labels, resize path, npz caching."""
    from video_distillation_tpu.data.image_datasets import load_imagenet

    root = str(tmp_path)
    wnids = [f"n{i:08d}" for i in range(3)]
    for split, n in (("train", 2), ("val", 1)):
        for ci, wnid in enumerate(wnids):
            # one class at 64^2 (passthrough), others at 96^2 (resize)
            _write_jpegs(osp.join(root, "imagenet_64x64", split, wnid), n,
                         64 if ci == 0 else 96, 30 * ci + 7)
    data = load_imagenet(root, workers=1)
    assert data.train.clips.shape == (6, 64, 64, 3)
    assert data.test.frames.shape == (3, 64, 64, 3)
    assert data.meta.num_classes == 1000
    for i in range(6):
        c = int(data.train.labels[i])
        assert data.train.clips[i, 32, 32, 0] == 30 * c + 7
    # second call hits the npz cache
    again = load_imagenet(root, workers=1)
    np.testing.assert_array_equal(again.train.clips, data.train.clips)
    assert os.path.exists(osp.join(root, "ImageNet_images.npz"))


def test_preprocessed_shard_roundtrip_with_zca(tmp_path):
    from video_distillation_tpu.ops.zca import apply_zca, fit_zca

    rng = np.random.default_rng(0)
    x = rng.random((25, 8, 8, 3)).astype(np.float32)
    y = rng.integers(0, 5, 25).astype(np.int32)
    state = fit_zca(x, reg=0.1)

    def pre(xb):
        return np.asarray(apply_zca(state, xb))

    lengths = write_preprocessed_shards(x, y, str(tmp_path), "train",
                                        preprocess_op=pre,
                                        num_per_shard=10)
    assert lengths == [10, 10, 5]
    xs, ys = load_preprocessed_shards(str(tmp_path), "train")
    np.testing.assert_array_equal(ys, y)
    np.testing.assert_allclose(xs, pre(x), rtol=1e-5, atol=1e-5)
    # ZCA whitening decorrelates: per-feature variance ~ uniform
    flat = xs.reshape(25, -1)
    cov = np.cov(flat.T)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).mean() < np.abs(np.diag(cov)).mean()
