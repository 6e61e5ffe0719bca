"""Packer + ingestion tests over fabricated frame-dir trees."""

import csv
import os
import os.path as osp

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from video_distillation_tpu.data.meta import DatasetMeta, register_meta
from video_distillation_tpu.data.packer import (pack_test_frames,
                                                pack_train_clips,
                                                read_ucf_csv)
from video_distillation_tpu.ingest.extract_ssv2 import evenly_spaced


def _make_ucf_tree(root, n_videos=4, n_frames=30, size=32):
    """Fabricate the UCF layout: jpegs_112/<folder>/frame%06d.jpg + CSV."""
    jp = osp.join(root, "jpegs_112")
    rows = []
    rng = np.random.default_rng(0)
    for i in range(n_videos):
        folder = f"v_Test_g{i:02d}_c01"
        d = osp.join(jp, folder)
        os.makedirs(d)
        for fi in range(1, n_frames + 1):
            arr = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
            Image.fromarray(arr).save(osp.join(d, "frame%06d.jpg" % fi))
        rows.append({"folder_name": folder,
                     "label": f"Class{i % 2}",
                     "split": "train" if i < n_videos // 2 else "test"})
    with open(osp.join(root, "test_splits.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["folder_name", "label", "split"])
        w.writeheader()
        w.writerows(rows)
    return root


def test_read_and_pack_ucf_layout(tmp_path):
    root = _make_ucf_tree(str(tmp_path))
    videos, labels, classes = read_ucf_csv(root, "test_splits.csv", "train")
    assert len(videos) == 2 and classes == ["Class0", "Class1"]

    meta = DatasetMeta(name="packtest", channel=3, im_size=(32, 32),
                       num_classes=2, mean=(0.485, 0.456, 0.406),
                       std=(0.229, 0.224, 0.225), frames=8)
    register_meta(meta)
    rng = np.random.default_rng(0)
    train = pack_train_clips(videos, labels, meta, rng, naming="ucf")
    assert train.clips.shape == (2, 8, 32, 32, 3)
    assert train.clips.dtype == np.uint8

    tvideos, tlabels, _ = read_ucf_csv(root, "test_splits.csv", "test")
    test = pack_test_frames(tvideos, tlabels, meta, naming="ucf")
    assert test.frames.shape[0] == 2 * 30
    assert test.lengths().tolist() == [30, 30]
    clips = test.sample_clips(rng)
    assert clips.shape == (2, 8, 32, 32, 3)


def test_pooled_packing_matches_serial(tmp_path):
    """The multiprocessing pool must not change packed bytes or RNG
    consumption (starts are drawn in the parent)."""
    root = _make_ucf_tree(str(tmp_path), n_videos=6, n_frames=20)
    videos, labels, _ = read_ucf_csv(root, "test_splits.csv", "train")
    meta = DatasetMeta(name="packtest_pool", channel=3, im_size=(32, 32),
                       num_classes=2, mean=(0.485, 0.456, 0.406),
                       std=(0.229, 0.224, 0.225), frames=8)
    register_meta(meta)
    serial = pack_train_clips(videos, labels, meta,
                              np.random.default_rng(7), naming="ucf",
                              workers=1)
    pooled = pack_train_clips(videos, labels, meta,
                              np.random.default_rng(7), naming="ucf",
                              workers=4)
    np.testing.assert_array_equal(serial.clips, pooled.clips)

    tser = pack_test_frames(videos, labels, meta, naming="ucf", workers=1)
    tpool = pack_test_frames(videos, labels, meta, naming="ucf", workers=4)
    np.testing.assert_array_equal(tser.frames, tpool.frames)
    np.testing.assert_array_equal(tser.offsets, tpool.offsets)


def test_evenly_spaced():
    assert evenly_spaced(10, 5) == [0, 2, 4, 6, 8]
    assert evenly_spaced(3, 5) == [0, 1, 2, 2, 2]
    assert len(evenly_spaced(100, 8)) == 8


def _make_max_csv_tree(root, n_videos=4, n_frames=40, size=32):
    """Fabricate the staticUCF50 max-csv layout (dataset.py:739-782):
    split_index column holds 3 segment-boundary frame numbers."""
    jp = osp.join(root, "jpegs_112")
    rows = []
    rng = np.random.default_rng(1)
    for i in range(n_videos):
        folder = f"v_Seg_g{i:02d}_c01"
        d = osp.join(jp, folder)
        os.makedirs(d)
        for fi in range(1, n_frames + 1):
            arr = np.full((size, size, 3), fi, np.uint8)  # frame id encoded
            Image.fromarray(arr).save(osp.join(d, "frame%06d.jpg" % fi))
        rows.append({"folder_name": folder, "label": f"Class{i % 2}",
                     "split": "train",
                     "split_index": "[10, 20, 30]"})
    with open(osp.join(root, "ucf50_splits1_max.csv"), "w",
              newline="") as f:
        w = csv.DictWriter(f, fieldnames=["folder_name", "label", "split",
                                          "split_index"])
        w.writeheader()
        w.writerows(rows)
    return root


def test_static_segment_packing(tmp_path):
    from video_distillation_tpu.data.packer import (pack_static_segments,
                                                    read_ucf_max_csv,
                                                    segment_start_range)

    root = _make_max_csv_tree(str(tmp_path))
    videos, labels, classes, segs = read_ucf_max_csv(root, "train")
    assert len(videos) == 4 and segs[0] == [10, 20, 30]

    # the 1-indexed bounds per reference dataset.py:820-830
    assert segment_start_range("feature", 0, 4, 40, [10, 20, 30]) == (1, 11)
    assert segment_start_range("feature", 1, 4, 40, [10, 20, 30]) == (11, 21)
    assert segment_start_range("feature", 3, 4, 40, [10, 20, 30]) == (31, 40)
    assert segment_start_range("mean", 2, 4, 40, None) == (21, 30)

    meta = DatasetMeta(name="segtest", channel=3, im_size=(32, 32),
                       num_classes=2, mean=(0.5, 0.5, 0.5),
                       std=(0.5, 0.5, 0.5), frames=8)
    register_meta(meta)
    rng = np.random.default_rng(0)
    for sid, (lo, hi) in enumerate([(1, 11), (11, 21), (21, 31), (31, 40)]):
        store = pack_static_segments(videos, labels, segs, meta, rng,
                                     "feature", sid)
        assert store.clips.shape == (4, 8, 32, 32, 3)
        # boring video: all frames identical, value = encoded frame number
        for vi in range(4):
            vals = np.unique(store.clips[vi])
            assert len(vals) == 1
            assert lo <= int(vals[0]) < hi
