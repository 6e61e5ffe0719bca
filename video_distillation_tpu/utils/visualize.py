"""Distilled-set visualization: PNG grids of statics / dynamics / videos.

Capability parity with the reference's ``save_frepo_image``
(``/root/reference/FRePo/lib/datadistillation/utils.py:40-118``), which
renders the prototype set as a labeled image grid at every save point —
inspecting the distilled data is how this line of research is debugged.
Differences by design: PIL instead of matplotlib (no figure machinery
needed for a raster grid), and videos render as one row per clip with
frames as columns (the reference's image sets have no temporal axis).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def scale_for_vis(x: np.ndarray, mean: Optional[Sequence[float]] = None,
                  std: Optional[Sequence[float]] = None) -> np.ndarray:
    """Map a distilled tensor to [0, 1] for display.

    With dataset stats, invert the (img - mean)/std normalization the
    synthetic tensors are optimized in; otherwise use the reference's
    std-rescale ``img/img.std()*0.2 + 0.5`` (utils.py:42-48).
    """
    x = np.asarray(x, np.float32)
    if mean is not None and std is not None:
        x = x * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
    else:
        s = float(x.std())
        x = x / (s if s > 0 else 1.0) * 0.2 + 0.5
    return np.clip(x, 0.0, 1.0)


def _to_grid(images: np.ndarray, ncol: int, pad: int = 2) -> np.ndarray:
    """(N, H, W, C) floats in [0,1] -> one (GH, GW, 3) uint8 grid array."""
    images = np.asarray(images, np.float32)
    if images.ndim == 3:
        images = images[..., None]
    if images.shape[-1] == 1:
        images = np.repeat(images, 3, axis=-1)
    n, h, w, _ = images.shape
    ncol = max(1, min(ncol, n))
    nrow = -(-n // ncol)
    grid = np.zeros((nrow * (h + pad) + pad, ncol * (w + pad) + pad, 3),
                    np.float32)
    for i in range(n):
        r, c = divmod(i, ncol)
        y0, x0 = pad + r * (h + pad), pad + c * (w + pad)
        grid[y0:y0 + h, x0:x0 + w] = images[i]
    return (grid * 255.0 + 0.5).astype(np.uint8)


def _save_png(path: str, grid_u8: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid_u8).save(path)


def save_image_grid(path: str, images, mean=None, std=None,
                    ncol: int = 10, max_images: int = 100) -> str:
    """Save up to ``max_images`` stills (N, H, W, C) as a PNG grid
    (reference caps at 100 / 10 per row — utils.py:69-83)."""
    images = np.asarray(images)[:max_images]
    _save_png(path, _to_grid(scale_for_vis(images, mean, std), ncol))
    return path


def save_video_grid(path: str, videos, mean=None, std=None,
                    max_videos: int = 10, max_frames: int = 8) -> str:
    """Save clips (N, F, H, W, C) as a PNG grid: one row per clip,
    frames as columns (temporally subsampled to ``max_frames``)."""
    videos = np.asarray(videos)[:max_videos]
    n, f = videos.shape[:2]
    stride = max(1, f // max_frames)
    sel = videos[:, ::stride][:, :max_frames]
    flat = sel.reshape((-1,) + sel.shape[2:])
    _save_png(path, _to_grid(scale_for_vis(flat, mean, std),
                             ncol=sel.shape[1]))
    return path


def save_s2d_grids(save_dir: str, step: int, static=None, dynamic=None,
                   videos=None, mean=None, std=None) -> list:
    """Write the S2D artifact grids for one save point under
    ``save_dir/png/``: static memory stills, dynamic memory volumes
    (1-channel, shown with the std-rescale), composed videos."""
    out = []
    png_dir = os.path.join(save_dir, "png")
    tag = str(step).zfill(6)
    if static is not None:
        out.append(save_image_grid(
            os.path.join(png_dir, f"static_{tag}.png"), static, mean, std))
    if dynamic is not None:
        dyn = np.asarray(dynamic)
        dyn = dyn.reshape((-1,) + dyn.shape[-4:])  # (N, F, H, W, 1)
        out.append(save_video_grid(
            os.path.join(png_dir, f"dynamic_{tag}.png"), dyn))
    if videos is not None:
        out.append(save_video_grid(
            os.path.join(png_dir, f"videos_{tag}.png"), videos, mean, std))
    return out
