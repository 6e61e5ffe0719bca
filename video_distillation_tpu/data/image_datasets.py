"""DC-lineage image datasets (MNIST..CIFAR100) as packed stores.

Parity with the image branches of ``get_dataset``
(``/root/reference/utils.py:26-123``): torchvision downloads, channel/
resolution/normalisation constants from ``data/meta.py``. The train split
becomes a ``ClipStore`` of images; the test split a ``RaggedFrameStore`` of
1-frame videos so the shared evaluation harness drives both data kinds.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import numpy as np

from .meta import get_meta
from .store import ClipStore, RaggedFrameStore, VideoData


def _to_uint8_nhwc(x: np.ndarray, channel: int) -> np.ndarray:
    if x.ndim == 3:  # (N, H, W) grayscale
        x = x[..., None]
    if x.shape[1] == channel and x.shape[-1] != channel:  # NCHW -> NHWC
        x = np.transpose(x, (0, 2, 3, 1))
    if x.dtype != np.uint8:
        x = (np.clip(x, 0, 1) * 255).astype(np.uint8)
    return x


def load_image_dataset(name: str, data_path: str,
                       download: bool = True) -> VideoData:
    """Load via torchvision and pack; cached as .npz under data_path."""
    meta = get_meta(name)
    cache = os.path.join(data_path, f"{name}_images.npz")
    if os.path.exists(cache):
        with np.load(cache) as z:
            xtr, ytr, xte, yte = (z["xtr"], z["ytr"], z["xte"], z["yte"])
    else:
        from torchvision import datasets

        os.makedirs(data_path, exist_ok=True)
        if name == "MNIST":
            tr = datasets.MNIST(data_path, train=True, download=download)
            te = datasets.MNIST(data_path, train=False, download=download)
            xtr, ytr = tr.data.numpy(), np.asarray(tr.targets)
            xte, yte = te.data.numpy(), np.asarray(te.targets)
        elif name == "FashionMNIST":
            tr = datasets.FashionMNIST(data_path, train=True,
                                       download=download)
            te = datasets.FashionMNIST(data_path, train=False,
                                       download=download)
            xtr, ytr = tr.data.numpy(), np.asarray(tr.targets)
            xte, yte = te.data.numpy(), np.asarray(te.targets)
        elif name in ("CIFAR10", "CIFAR100"):
            cls = getattr(datasets, name)
            tr = cls(data_path, train=True, download=download)
            te = cls(data_path, train=False, download=download)
            xtr, ytr = tr.data, np.asarray(tr.targets)
            xte, yte = te.data, np.asarray(te.targets)
        elif name == "SVHN":
            tr = datasets.SVHN(data_path, split="train", download=download)
            te = datasets.SVHN(data_path, split="test", download=download)
            xtr, ytr = np.transpose(tr.data, (0, 2, 3, 1)), tr.labels
            xte, yte = np.transpose(te.data, (0, 2, 3, 1)), te.labels
        else:
            raise ValueError(f"unsupported image dataset: {name}")
        xtr = _to_uint8_nhwc(np.asarray(xtr), meta.channel)
        xte = _to_uint8_nhwc(np.asarray(xte), meta.channel)
        np.savez_compressed(cache, xtr=xtr, ytr=ytr, xte=xte, yte=yte)

    train = ClipStore(xtr, np.asarray(ytr, np.int32), meta)
    n_test = xte.shape[0]
    test = RaggedFrameStore(
        frames=xte, offsets=np.arange(n_test + 1, dtype=np.int64),
        labels=np.asarray(yte, np.int32),
        meta=dataclasses.replace(meta, frames=1))
    return VideoData(meta=meta, train=train, test=test)


def from_arrays(name: str, xtr, ytr, xte, yte) -> VideoData:
    """Build an image VideoData from in-memory arrays (tests)."""
    meta = get_meta(name)
    train = ClipStore(_to_uint8_nhwc(xtr, meta.channel),
                      np.asarray(ytr, np.int32), meta)
    n_test = xte.shape[0]
    test = RaggedFrameStore(
        frames=_to_uint8_nhwc(xte, meta.channel),
        offsets=np.arange(n_test + 1, dtype=np.int64),
        labels=np.asarray(yte, np.int32),
        meta=dataclasses.replace(meta, frames=1))
    return VideoData(meta=meta, train=train, test=test)
