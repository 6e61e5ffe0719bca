"""Coreset baselines: k-center and herding selection in embedding space.

Parity with ``/root/reference/distill_coreset.py:24-110``: a frozen
(optionally pretrained) net's ``embed`` maps every clip of a class to
features; k-center seeds with the clip closest to the class mean then
greedily adds the farthest-from-nearest-center clip (:75-91); herding
greedily matches the running mean (:92-110). The selected clips form the
synthetic set, evaluated with the standard protocol.

TPU-first: embedding runs as chunked jitted forwards over the HBM store;
the tiny greedy loops run on host numpy.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.store import ClipStore
from ..models.registry import create_model


@functools.lru_cache(maxsize=16)
def _build_embed_fn(model_name: str, channel: int, num_classes: int,
                    im_size: Tuple[int, int], frames: int):
    model_def = create_model(model_name, channel, num_classes, im_size,
                             frames)

    def embed(params, clips_u8, norm_mean, norm_std):
        x = (clips_u8.astype(jnp.float32) - norm_mean) / norm_std
        return model_def.apply({"params": params}, x, train=True,
                               output="feat")

    return jax.jit(embed), model_def


def _kcenter(features: np.ndarray, ipc: int) -> list:
    mean = features.mean(axis=0, keepdims=True)
    dis = np.linalg.norm(features - mean, axis=1)
    idx_centers = [int(np.argsort(dis)[0])]
    for _ in range(ipc - 1):
        centers = features[idx_centers]  # (k, D)
        d = np.linalg.norm(features[:, None] - centers[None], axis=-1)
        dis_min = d.min(axis=1)
        idx_centers.append(int(np.argmax(dis_min)))
    return idx_centers


def _herding(features: np.ndarray, ipc: int) -> list:
    mean = features.mean(axis=0, keepdims=True)
    idx_selected: list = []
    idx_left = list(range(features.shape[0]))
    for i in range(ipc):
        if idx_selected:
            det = mean * (i + 1) - features[idx_selected].sum(axis=0)
        else:
            det = mean * (i + 1)
        dis = np.linalg.norm(det - features[idx_left], axis=1)
        j = int(np.argmin(dis))
        idx_selected.append(idx_left[j])
        del idx_left[j]
    return idx_selected


def select_coreset(key, store: ClipStore, model_name: str, ipc: int,
                   method: str = "k-center", frames: int = 16,
                   params=None, chunk: int = 64):
    """Returns (syn_images (C*ipc,F,H,W,3) normalised float32, labels)."""
    meta = store.meta
    embed_fn, model_def = _build_embed_fn(model_name, meta.channel,
                                          meta.num_classes,
                                          tuple(meta.im_size), frames)
    if params is None:
        sample = jnp.zeros((1, frames, meta.im_size[0], meta.im_size[1],
                            meta.channel))
        params = model_def.init({"params": key, "dropout": key}, sample,
                                train=False)["params"]
    norm_mean = jnp.asarray(meta.mean, jnp.float32) * 255.0
    norm_std = jnp.asarray(meta.std, jnp.float32) * 255.0
    clips_dev = store.device_clips()

    selector = {"k-center": _kcenter, "herding": _herding}[method]
    C = meta.num_classes
    picked = []
    for c in range(C):
        cls_idx = np.nonzero(store.labels == c)[0]
        feats = []
        for i in range(0, len(cls_idx), chunk):
            part = jnp.asarray(cls_idx[i:i + chunk])
            batch = store.gather_clips(clips_dev, part)
            feats.append(np.asarray(embed_fn(params, batch,
                                             norm_mean, norm_std)))
        feats = np.concatenate(feats, axis=0)
        sel = selector(feats, min(ipc, len(cls_idx)))
        chosen = cls_idx[sel]
        while len(chosen) < ipc:  # degenerate tiny class
            chosen = np.concatenate([chosen, chosen[: ipc - len(chosen)]])
        picked.append(chosen)
    picked = np.concatenate(picked)
    syn = store.normalize(jnp.asarray(store.clips[picked]))
    labels = jnp.asarray(np.repeat(np.arange(C), ipc).astype(np.int32))
    return syn.astype(jnp.float32), labels
