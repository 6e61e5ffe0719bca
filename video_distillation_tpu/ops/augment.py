"""DSA differentiable augmentation (JAX) + DC non-differentiable augment.

Parity with ``/root/reference/utils.py:999-1175`` (``ParamDiffAug``,
``DiffAugment``, ``AUGMENT_FNS``: color/crop/cutout/flip/scale/rotate) and
``utils.py:890-970`` (DC ``augment``, ``get_daparam``).

Semantics reproduced:
* strategy string 'color_crop_cutout...' with aug_mode 'S' (pick ONE random
  strategy per call) or 'M' (apply all in order) — utils.py:1031-1043
* "Siamese" mode: when a seed is supplied, every sample in the batch gets
  the SAME transform parameters (utils.py:1012-1017, the
  ``param.Siamese`` branches) — here: draw per-sample params, then
  broadcast row 0 when siamese
* scale/rotate go through an affine grid + bilinear zero-padded
  grid-sample, matching torch ``F.affine_grid``/``F.grid_sample``
  (align_corners=False)

Layout: ``(B, H, W, C)`` images. All ops are jit/vmap-compatible and
differentiable w.r.t. x.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ParamDiffAug:
    aug_mode: str = "S"
    prob_flip: float = 0.5
    ratio_scale: float = 1.2
    ratio_rotate: float = 15.0
    ratio_crop_pad: float = 0.125
    ratio_cutout: float = 0.5
    brightness: float = 1.0
    saturation: float = 2.0
    contrast: float = 0.5


def _maybe_siamese(v, siamese):
    return jnp.where(siamese, jnp.broadcast_to(v[:1], v.shape), v)


def affine_grid_sample(x, theta):
    """torch F.affine_grid + F.grid_sample(zeros, bilinear,
    align_corners=False) for NHWC x and theta (B, 2, 3)."""
    b, h, w, c = x.shape
    # normalized output coords, align_corners=False
    ys = (2.0 * jnp.arange(h) + 1.0) / h - 1.0
    xs = (2.0 * jnp.arange(w) + 1.0) / w - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)
    # theta maps output coords -> input coords (torch convention)
    coords = jnp.einsum("hwk,bjk->bhwj", base, theta)  # (B,H,W,2) [x, y]
    ix = ((coords[..., 0] + 1.0) * w - 1.0) / 2.0
    iy = ((coords[..., 1] + 1.0) * h - 1.0) / 2.0

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = ix - x0
    wy1 = iy - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1

    def gather(yi, xi):
        inside = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        bb = jnp.arange(b)[:, None, None]
        vals = x[bb, yi_c, xi_c]  # (B,H,W,C)
        return vals * inside[..., None]

    out = (gather(y0, x0) * (wy0 * wx0)[..., None] +
           gather(y0, x1) * (wy0 * wx1)[..., None] +
           gather(y1, x0) * (wy1 * wx0)[..., None] +
           gather(y1, x1) * (wy1 * wx1)[..., None])
    return out


def rand_scale(x, key, p: ParamDiffAug, siamese):
    ratio = p.ratio_scale
    k1, k2 = jax.random.split(key)
    b = x.shape[0]
    sx = jax.random.uniform(k1, (b,)) * (ratio - 1.0 / ratio) + 1.0 / ratio
    sy = jax.random.uniform(k2, (b,)) * (ratio - 1.0 / ratio) + 1.0 / ratio
    sx = _maybe_siamese(sx, siamese)
    sy = _maybe_siamese(sy, siamese)
    zeros = jnp.zeros_like(sx)
    theta = jnp.stack([
        jnp.stack([sx, zeros, zeros], -1),
        jnp.stack([zeros, sy, zeros], -1),
    ], axis=1)  # (B,2,3)
    return affine_grid_sample(x, theta)


def rand_rotate(x, key, p: ParamDiffAug, siamese):
    ratio = p.ratio_rotate
    b = x.shape[0]
    theta_a = (jax.random.uniform(key, (b,)) - 0.5) * 2 * ratio / 180 * np.pi
    theta_a = _maybe_siamese(theta_a, siamese)
    cos, sin = jnp.cos(theta_a), jnp.sin(theta_a)
    zeros = jnp.zeros_like(cos)
    theta = jnp.stack([
        jnp.stack([cos, -sin, zeros], -1),
        jnp.stack([sin, cos, zeros], -1),
    ], axis=1)
    return affine_grid_sample(x, theta)


def rand_flip(x, key, p: ParamDiffAug, siamese):
    b = x.shape[0]
    randf = jax.random.uniform(key, (b, 1, 1, 1))
    randf = _maybe_siamese(randf, siamese)
    return jnp.where(randf < p.prob_flip, x[:, :, ::-1, :], x)


def rand_brightness(x, key, p: ParamDiffAug, siamese):
    b = x.shape[0]
    randb = jax.random.uniform(key, (b, 1, 1, 1))
    randb = _maybe_siamese(randb, siamese)
    return x + (randb - 0.5) * p.brightness


def rand_saturation(x, key, p: ParamDiffAug, siamese):
    b = x.shape[0]
    x_mean = x.mean(axis=-1, keepdims=True)
    rands = jax.random.uniform(key, (b, 1, 1, 1))
    rands = _maybe_siamese(rands, siamese)
    return (x - x_mean) * (rands * p.saturation) + x_mean


def rand_contrast(x, key, p: ParamDiffAug, siamese):
    b = x.shape[0]
    x_mean = x.mean(axis=(1, 2, 3), keepdims=True)
    randc = jax.random.uniform(key, (b, 1, 1, 1))
    randc = _maybe_siamese(randc, siamese)
    return (x - x_mean) * (randc + p.contrast) + x_mean


def rand_crop(x, key, p: ParamDiffAug, siamese):
    """Shift-crop with 1px zero pad (utils.py:1122-1142)."""
    b, h, w, c = x.shape
    shift_y = int(h * p.ratio_crop_pad + 0.5)
    shift_x = int(w * p.ratio_crop_pad + 0.5)
    k1, k2 = jax.random.split(key)
    ty = jax.random.randint(k1, (b, 1, 1), -shift_y, shift_y + 1)
    tx = jax.random.randint(k2, (b, 1, 1), -shift_x, shift_x + 1)
    ty = _maybe_siamese(ty, siamese)
    tx = _maybe_siamese(tx, siamese)
    gy = jnp.clip(jnp.arange(h)[None, :, None] + ty + 1, 0, h + 1)
    gx = jnp.clip(jnp.arange(w)[None, None, :] + tx + 1, 0, w + 1)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    bb = jnp.arange(b)[:, None, None]
    return x_pad[bb, gy, gx]


def rand_cutout(x, key, p: ParamDiffAug, siamese):
    b, h, w, c = x.shape
    ch = int(h * p.ratio_cutout + 0.5)
    cw = int(w * p.ratio_cutout + 0.5)
    k1, k2 = jax.random.split(key)
    oy = jax.random.randint(k1, (b, 1, 1), 0, h + (1 - ch % 2))
    ox = jax.random.randint(k2, (b, 1, 1), 0, w + (1 - cw % 2))
    oy = _maybe_siamese(oy, siamese)
    ox = _maybe_siamese(ox, siamese)
    gy = jnp.arange(h)[None, :, None]
    gx = jnp.arange(w)[None, None, :]
    in_y = (gy >= oy - ch // 2) & (gy < oy - ch // 2 + ch)
    in_x = (gx >= ox - cw // 2) & (gx < ox - cw // 2 + cw)
    mask = 1.0 - (in_y & in_x).astype(x.dtype)
    return x * mask[..., None]


AUGMENT_FNS = {
    "color": [rand_brightness, rand_saturation, rand_contrast],
    "crop": [rand_crop],
    "cutout": [rand_cutout],
    "flip": [rand_flip],
    "scale": [rand_scale],
    "rotate": [rand_rotate],
}


def diff_augment(x, strategy: str, key, param: ParamDiffAug | None = None,
                 siamese: bool = False):
    """DiffAugment over NHWC images (utils.py:1020-1045).

    ``siamese=True`` shares one parameter draw across the batch — the
    reference's seed-synchronized mode for matching real/syn pairs.
    """
    if strategy in ("None", "none", ""):
        return x
    param = param or ParamDiffAug()
    pbties = strategy.split("_")
    if param.aug_mode == "M":
        for pname in pbties:
            for f in AUGMENT_FNS[pname]:
                key, k = jax.random.split(key)
                x = f(x, k, param, siamese)
        return x
    if param.aug_mode == "S":
        key, kc = jax.random.split(key)
        choice = int(jax.random.randint(kc, (), 0, len(pbties)))
        # NB: strategy choice is data-independent; for jit-ability prefer
        # diff_augment_jit below which uses lax.switch.
        for f in AUGMENT_FNS[pbties[choice]]:
            key, k = jax.random.split(key)
            x = f(x, k, param, siamese)
        return x
    raise ValueError(f"unknown augmentation mode: {param.aug_mode}")


def make_diff_augment(strategy: str, param: ParamDiffAug | None = None,
                      siamese: bool = False):
    """jit-compatible DiffAugment: random single-strategy choice via
    ``lax.switch`` (aug_mode 'S')."""
    param = param or ParamDiffAug()
    if strategy in ("None", "none", ""):
        return lambda key, x: x
    pbties = strategy.split("_")

    def apply_branch(pname, key, x):
        for f in AUGMENT_FNS[pname]:
            key, k = jax.random.split(key)
            x = f(x, k, param, jnp.asarray(siamese))
        return x

    branches = [partial(apply_branch, pname) for pname in pbties]

    def fn(key, x):
        if param.aug_mode == "M":
            for br in branches:
                key, k = jax.random.split(key)
                x = br(k, x)
            return x
        kc, key = jax.random.split(key)
        idx = jax.random.randint(kc, (), 0, len(branches))
        return jax.lax.switch(idx, [partial(br, key) for br in branches], x)

    return fn


# ---------------------------------------------------------------------------
# DC (non-differentiable) augmentation — utils.py:890-970
# ---------------------------------------------------------------------------

def get_daparam(dataset: str, model: str, model_eval: str, ipc: int) -> dict:
    """utils.py:953-970."""
    p = {"crop": 4, "scale": 0.2, "rotate": 45, "noise": 0.001,
         "strategy": "none"}
    if dataset == "MNIST":
        p["strategy"] = "crop_scale_rotate"
    if model_eval in ("ConvNetBN",):
        p["strategy"] = "crop_noise"
    return p


def dc_augment(images: np.ndarray, dc_aug_param: dict,
               rng: np.random.Generator) -> np.ndarray:
    """Host-side DC augmentation: one random op (crop/scale/rotate/noise)
    per image (utils.py:890-949). NHWC numpy."""
    if dc_aug_param is None or dc_aug_param["strategy"] == "none":
        return images
    from scipy.ndimage import rotate as scipyrotate

    images = images.copy()
    n, h, w, c = images.shape
    crop, scale = dc_aug_param["crop"], dc_aug_param["scale"]
    rot, noise = dc_aug_param["rotate"], dc_aug_param["noise"]
    mean = images.mean(axis=(0, 1, 2))
    augs = dc_aug_param["strategy"].split("_")

    for i in range(n):
        choice = augs[rng.integers(0, len(augs))]
        if choice == "crop":
            im_ = np.zeros((h + crop * 2, w + crop * 2, c), images.dtype)
            im_[:, :] = mean
            im_[crop:crop + h, crop:crop + w] = images[i]
            r = int(rng.integers(0, crop * 2))
            s = int(rng.integers(0, crop * 2))
            images[i] = im_[r:r + h, s:s + w]
        elif choice == "scale":
            sh = int(rng.uniform(1 - scale, 1 + scale) * h)
            sw = int(rng.uniform(1 - scale, 1 + scale) * h)
            yi = np.clip((np.arange(sh) * (h / sh)).astype(int), 0, h - 1)
            xi = np.clip((np.arange(sw) * (w / sw)).astype(int), 0, w - 1)
            tmp = images[i][yi][:, xi]
            mhw = max(sh, sw, h, w)
            im_ = np.zeros((mhw, mhw, c), images.dtype)
            r, s = (mhw - sh) // 2, (mhw - sw) // 2
            im_[r:r + sh, s:s + sw] = tmp
            r, s = (mhw - h) // 2, (mhw - w) // 2
            images[i] = im_[r:r + h, s:s + w]
        elif choice == "rotate":
            im_ = scipyrotate(images[i], angle=float(rng.integers(-rot, rot)),
                              axes=(0, 1), cval=float(np.mean(mean)))
            r = (im_.shape[0] - h) // 2
            s = (im_.shape[1] - w) // 2
            images[i] = im_[r:r + h, s:s + w]
        elif choice == "noise":
            images[i] = images[i] + noise * rng.standard_normal((h, w, c))
    return images
