"""augmax-equivalent augmentation surface (geometric warps, colorspace,
image-level), batched NHWC, jit/grad-friendly.

Capability parity with the reference's vendored augmax
(``/root/reference/FRePo/lib/dataset/augmax/``): geometric ops
(``geometric.py``: flips, Rotate90, Rotate, Translate/RandomTranslate,
Center/Random/RandomSizedCrop, Resize, Warp), colorspace ops
(``colorspace.py``: ByteToFloat, Normalize, ChannelShuffle, RandomGamma,
RandomBrightness, RandomContrast, ColorJitter, RandomGrayscale,
Solarization) and image-level ops (``imagelevel.py``: Cutout,
NormalizedColorJitter; GridShuffle/blur live in ``augment_extra``).

Design: every op is a factory returning ``fn(key, x)`` over a batched
``(B, H, W, C)`` float image tensor, drawing per-sample parameters — the
distributional equivalent of augmax's ``jax.vmap(transform)`` with split
rngs (``export.py:7-18``, use_siamese=False). Geometric ops compose a
per-sample affine (or dense offset field) and resample bilinearly.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def log_uniform(key, shape, minval, maxval):
    """exp(U(log min, log max)) — augmax utils.log_uniform."""
    return jnp.exp(jax.random.uniform(
        key, shape, minval=math.log(minval), maxval=math.log(maxval)))


# ---------------------------------------------------------------------------
# geometric core: batched bilinear warp
# ---------------------------------------------------------------------------

def warp_bilinear(x, iy, ix, fill: float = 0.0):
    """Sample x (B,H,W,C) at float input coords iy/ix (B,Ho,Wo); bilinear,
    out-of-range reads ``fill``."""
    b, h, w, c = x.shape
    y0 = jnp.floor(iy)
    x0 = jnp.floor(ix)
    wy1 = iy - y0
    wx1 = ix - x0
    wy0, wx0 = 1.0 - wy1, 1.0 - wx1

    def gather(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        bb = jnp.arange(b)[:, None, None]
        vals = x[bb, yc, xc]
        return jnp.where(inside[..., None], vals, fill)

    return (gather(y0, x0) * (wy0 * wx0)[..., None] +
            gather(y0, x0 + 1) * (wy0 * wx1)[..., None] +
            gather(y0 + 1, x0) * (wy1 * wx0)[..., None] +
            gather(y0 + 1, x0 + 1) * (wy1 * wx1)[..., None])


def affine_warp(x, mats, out_size: Tuple[int, int] = None,
                fill: float = 0.0):
    """Apply per-sample 2x3 output->input pixel-coordinate affines (around
    the image center) and resample."""
    b, h, w, _ = x.shape
    ho, wo = out_size or (h, w)
    yy, xx = jnp.meshgrid(jnp.arange(ho, dtype=jnp.float32),
                          jnp.arange(wo, dtype=jnp.float32), indexing="ij")
    # center-origin output coords
    yc = yy - (ho - 1) / 2.0
    xc = xx - (wo - 1) / 2.0
    ones = jnp.ones_like(yc)
    base = jnp.stack([yc, xc, ones], axis=-1)  # (Ho, Wo, 3)
    coords = jnp.einsum("hwk,bjk->bhwj", base, mats)  # (B,Ho,Wo,2) [y, x]
    iy = coords[..., 0] + (h - 1) / 2.0
    ix = coords[..., 1] + (w - 1) / 2.0
    return warp_bilinear(x, iy, ix, fill)


def _mats(a, b_, ty, tx):
    """Stack per-sample [[a, b, ty], [-b, a, tx]]-style rows into (B,2,3)."""
    return jnp.stack([
        jnp.stack([a, b_, ty], -1),
        jnp.stack([-b_, a, tx], -1),
    ], axis=1)


# ---------------------------------------------------------------------------
# geometric ops (factories)
# ---------------------------------------------------------------------------

def horizontal_flip(p: float = 0.5):
    def fn(key, x):
        do = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
        return jnp.where(do, x[:, :, ::-1, :], x)
    return fn


def vertical_flip(p: float = 0.5):
    def fn(key, x):
        do = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
        return jnp.where(do, x[:, ::-1, :, :], x)
    return fn


def random_flip(p: float = 0.5):
    """Flip horizontally or vertically at random (augmax RandomFlip)."""
    hf, vf = horizontal_flip(1.0), vertical_flip(1.0)

    def fn(key, x):
        k1, k2, k3 = jax.random.split(key, 3)
        do = jax.random.bernoulli(k1, p, (x.shape[0], 1, 1, 1))
        horiz = jax.random.bernoulli(k2, 0.5, (x.shape[0], 1, 1, 1))
        flipped = jnp.where(horiz, hf(k3, x), vf(k3, x))
        return jnp.where(do, flipped, x)
    return fn


def rotate90():
    """Random k*90-degree rotation per sample (augmax Rotate90)."""
    def fn(key, x):
        ks = jax.random.randint(key, (x.shape[0],), 0, 4)
        rots = jnp.stack([x,
                          jnp.rot90(x, 1, axes=(1, 2)),
                          jnp.rot90(x, 2, axes=(1, 2)),
                          jnp.rot90(x, 3, axes=(1, 2))])
        return rots[ks, jnp.arange(x.shape[0])]
    return fn


def rotate(angle_range: Tuple[float, float] = (-30, 30), p: float = 1.0):
    def fn(key, x):
        k1, k2 = jax.random.split(key)
        b = x.shape[0]
        deg = jax.random.uniform(k1, (b,), minval=angle_range[0],
                                 maxval=angle_range[1])
        rad = deg * np.pi / 180.0
        cos, sin = jnp.cos(rad), jnp.sin(rad)
        out = affine_warp(x, _mats(cos, sin, jnp.zeros(b), jnp.zeros(b)))
        do = jax.random.bernoulli(k2, p, (b, 1, 1, 1))
        return jnp.where(do, out, x)
    return fn


def translate(dx: float, dy: float):
    """Fixed pixel translation (augmax Translate)."""
    def fn(key, x):
        b = x.shape[0]
        ones = jnp.ones(b)
        zero = jnp.zeros(b)
        # output->input: shift by (-dy, -dx)
        return affine_warp(x, _mats(ones, zero, zero - dy, zero - dx))
    return fn


def random_translate(ratio: float = 0.125):
    """Random shift up to +-ratio of the size per axis
    (augmax RandomTranslate)."""
    def fn(key, x):
        b, h, w, _ = x.shape
        k1, k2 = jax.random.split(key)
        ty = jax.random.uniform(k1, (b,), minval=-ratio * h,
                                maxval=ratio * h)
        tx = jax.random.uniform(k2, (b,), minval=-ratio * w,
                                maxval=ratio * w)
        ones = jnp.ones(b)
        zero = jnp.zeros(b)
        return affine_warp(x, _mats(ones, zero, ty, tx))
    return fn


def center_crop(height: int, width: int):
    def fn(key, x):
        b = x.shape[0]
        ones = jnp.ones(b)
        zero = jnp.zeros(b)
        return affine_warp(x, _mats(ones, zero, zero, zero),
                           out_size=(height, width))
    return fn


def crop(x0: float, y0: float, width: int, height: int):
    """Corner crop at (x0, y0) with the given size (augmax Crop,
    geometric.py:369-408): output->input translation by the offset of the
    crop's center from the image center."""
    def fn(key, x):
        b, h, w, _ = x.shape
        ty = jnp.full((b,), y0 + height / 2.0 - h / 2.0)
        tx = jnp.full((b,), x0 + width / 2.0 - w / 2.0)
        ones = jnp.ones(b)
        zero = jnp.zeros(b)
        return affine_warp(x, _mats(ones, zero, ty, tx),
                           out_size=(height, width))
    return fn


def random_crop(height: int, width: int):
    def fn(key, x):
        b, h, w, _ = x.shape
        k1, k2 = jax.random.split(key)
        my = (h - height) / 2.0
        mx = (w - width) / 2.0
        ty = jax.random.uniform(k1, (b,), minval=-my, maxval=my)
        tx = jax.random.uniform(k2, (b,), minval=-mx, maxval=mx)
        ones = jnp.ones(b)
        zero = jnp.zeros(b)
        return affine_warp(x, _mats(ones, zero, ty, tx),
                           out_size=(height, width))
    return fn


def resize(height: int, width: int):
    def fn(key, x):
        b, h, w, _ = x.shape
        sy = jnp.full((b,), h / height)
        sx = jnp.full((b,), w / width)
        zero = jnp.zeros(b)
        mats = jnp.stack([
            jnp.stack([sy, zero, zero], -1),
            jnp.stack([zero, sx, zero], -1),
        ], axis=1)
        return affine_warp(x, mats, out_size=(height, width))
    return fn


def random_sized_crop(width: int, height: int = None,
                      zoom_range: Tuple[float, float] = (0.5, 2.0),
                      prevent_underzoom: bool = True):
    """Random zoom (log-uniform) + random center, rescaled to (height,
    width) — augmax RandomSizedCrop (geometric.py:508-571)."""
    height = height or width

    def fn(key, x):
        b, h, w, _ = x.shape
        k1, k2, k3 = jax.random.split(key, 3)
        lo, hi = zoom_range
        if prevent_underzoom:
            lo = max(lo, height / h, width / w)
            hi = max(hi, lo)
        zoom = log_uniform(k1, (b,), lo, hi)
        # window in input pixels has size (height/zoom, width/zoom)
        limit_y = jnp.abs((h * zoom - height) / 2) / zoom
        limit_x = jnp.abs((w * zoom - width) / 2) / zoom
        cy = jax.random.uniform(k2, (b,), minval=-1.0, maxval=1.0) * limit_y
        cx = jax.random.uniform(k3, (b,), minval=-1.0, maxval=1.0) * limit_x
        inv = 1.0 / zoom
        zero = jnp.zeros(b)
        mats = jnp.stack([
            jnp.stack([inv, zero, cy], -1),
            jnp.stack([zero, inv, cx], -1),
        ], axis=1)
        return affine_warp(x, mats, out_size=(height, width))
    return fn


def warp(strength: float = 5.0, coarseness: int = 32):
    """Elastic-style warp: coarse gaussian offset field, bicubic-upsampled
    to dense per-pixel offsets (augmax Warp, geometric.py:573-602)."""
    def fn(key, x):
        b, h, w, _ = x.shape
        hc, wc = max(1, h // coarseness), max(1, w // coarseness)
        off = strength * jax.random.normal(key, (b, 2, hc, wc))
        off = jax.image.resize(off, (b, 2, h, w), method="bicubic")
        yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing="ij")
        iy = yy[None] + off[:, 0]
        ix = xx[None] + off[:, 1]
        return warp_bilinear(x, iy, ix)
    return fn


# ---------------------------------------------------------------------------
# colorspace ops
# ---------------------------------------------------------------------------

def byte_to_float():
    return lambda key, x: x.astype(jnp.float32) / 255.0


def normalize(mean: Sequence[float], std: Sequence[float]):
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return lambda key, x: (x - m) / s


def channel_shuffle(p: float = 0.5):
    def fn(key, x):
        b, _, _, c = x.shape
        k1, k2 = jax.random.split(key)
        perms = jax.vmap(lambda k: jax.random.permutation(k, c))(
            jax.random.split(k1, b))
        shuffled = jnp.take_along_axis(x, perms[:, None, None, :], axis=-1)
        do = jax.random.bernoulli(k2, p, (b, 1, 1, 1))
        return jnp.where(do, shuffled, x)
    return fn


def random_gamma(gamma_range: Tuple[float, float] = (0.75, 1.33),
                 p: float = 1.0):
    """x ** gamma on [0,1] images (augmax RandomGamma)."""
    def fn(key, x):
        b = x.shape[0]
        k1, k2 = jax.random.split(key)
        g = log_uniform(k1, (b, 1, 1, 1), gamma_range[0], gamma_range[1])
        out = jnp.clip(x, 1e-6, 1.0) ** g
        do = jax.random.bernoulli(k2, p, (b, 1, 1, 1))
        return jnp.where(do, out, x)
    return fn


def random_brightness(strength: float = 0.5, p: float = 1.0):
    def fn(key, x):
        b = x.shape[0]
        k1, k2 = jax.random.split(key)
        amt = jax.random.uniform(k1, (b, 1, 1, 1), minval=-strength,
                                 maxval=strength)
        do = jax.random.bernoulli(k2, p, (b, 1, 1, 1))
        return jnp.where(do, x + amt, x)
    return fn


def random_contrast(strength: float = 0.5, p: float = 1.0):
    def fn(key, x):
        b = x.shape[0]
        k1, k2 = jax.random.split(key)
        amt = log_uniform(k1, (b, 1, 1, 1), 1.0 / (1.0 + strength),
                          1.0 + strength)
        mean = x.mean(axis=(1, 2, 3), keepdims=True)
        do = jax.random.bernoulli(k2, p, (b, 1, 1, 1))
        return jnp.where(do, (x - mean) * amt + mean, x)
    return fn


def rgb_to_hsv(x):
    """(..., 3) RGB in [0,1] -> (h, s, v), each (...)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = v - mn
    s = jnp.where(v > 0, d / jnp.maximum(v, 1e-12), 0.0)
    safe_d = jnp.maximum(d, 1e-12)
    hr = ((g - b) / safe_d) % 6.0
    hg = (b - r) / safe_d + 2.0
    hb = (r - g) / safe_d + 4.0
    h = jnp.where(v == r, hr, jnp.where(v == g, hg, hb)) / 6.0
    h = jnp.where(d == 0, 0.0, h)
    return h, s, v


def hsv_to_rgb(h, s, v):
    h6 = (h % 1.0) * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(brightness: float = 0.8, contrast: float = 0.8,
                 saturation: float = 0.8, hue: float = 0.2, p: float = 0.5):
    """HSV-space jitter on [0,1] RGB (augmax ColorJitter,
    colorspace.py:244-322; BYOL-style)."""
    def fn(key, x):
        b = x.shape[0]
        kb, kc, kh, ks, kp = jax.random.split(key, 5)
        h, s, v = rgb_to_hsv(x)
        if brightness > 0:
            amt = jax.random.uniform(kb, (b, 1, 1), minval=-brightness,
                                     maxval=brightness)
            v = jnp.clip(v + amt, 0.0, 1.0)
        if contrast > 0:
            amt = jax.random.uniform(kc, (b, 1, 1), minval=-contrast,
                                     maxval=contrast)
            mean = v.mean(axis=(1, 2), keepdims=True)
            v = jnp.clip((v - mean) * (1 + amt) + mean, 0.0, 1.0)
        if hue > 0:
            amt = jax.random.uniform(kh, (b, 1, 1), minval=-hue, maxval=hue)
            h = (h + amt) % 1.0
        if saturation > 0:
            amt = log_uniform(ks, (b, 1, 1), 1.0 / (1.0 + saturation),
                              1.0 + saturation)
            s = jnp.clip(s * amt, 0.0, 1.0)
        out = hsv_to_rgb(h, s, v)
        do = jax.random.bernoulli(kp, p, (b, 1, 1, 1))
        return jnp.where(do, out, x)
    return fn


def random_grayscale(p: float = 0.5):
    def fn(key, x):
        lum = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
        gray = jnp.repeat(lum[..., None], 3, axis=-1)
        do = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
        return jnp.where(do, gray, x)
    return fn


def solarize(threshold: float = 0.5, p: float = 0.5):
    def fn(key, x):
        do = jax.random.bernoulli(key, p, (x.shape[0], 1, 1, 1))
        return jnp.where((x > threshold) & do, 1.0 - x, x)
    return fn


# ---------------------------------------------------------------------------
# image-level ops
# ---------------------------------------------------------------------------

def cutout(num_holes: int = 1, max_h_size: int = 8, max_w_size: int = 8,
           fill_value: float = 0.0, p: float = 0.5):
    """Zero out random rectangles (augmax Cutout, imagelevel.py:146-206)."""
    def fn(key, x):
        b, h, w, _ = x.shape
        kp, key = jax.random.split(key)
        mask = jnp.ones((b, h, w), bool)
        gy = jnp.arange(h)[None, :, None]
        gx = jnp.arange(w)[None, None, :]
        for i in range(num_holes):
            key, k1, k2 = jax.random.split(key, 3)
            cy = jax.random.randint(k1, (b, 1, 1), 0, h)
            cx = jax.random.randint(k2, (b, 1, 1), 0, w)
            in_y = (gy >= cy - max_h_size // 2) & \
                   (gy < cy - max_h_size // 2 + max_h_size)
            in_x = (gx >= cx - max_w_size // 2) & \
                   (gx < cx - max_w_size // 2 + max_w_size)
            mask = mask & ~(in_y & in_x)
        out = jnp.where(mask[..., None], x, fill_value)
        do = jax.random.bernoulli(kp, p, (b, 1, 1, 1))
        return jnp.where(do, out, x)
    return fn


def normalized_color_jitter(brightness: float = 0.5, contrast: float = 1.0,
                            saturation: float = 0.5, p: float = 0.5):
    """DC-style jitter for NORMALIZED images (augmax NormalizedColorJitter,
    imagelevel.py:209-271): brightness add, contrast/saturation log-uniform
    scaling around the mean; contrast/saturation strengths are exp()'d."""
    c_str = math.exp(contrast) if contrast > 0 else 0.0
    s_str = math.exp(saturation) if saturation > 0 else 0.0

    def fn(key, x):
        b = x.shape[0]
        kb, kc, ks = jax.random.split(key, 3)
        if brightness > 0:
            amt = jax.random.uniform(kb, (b, 1, 1, 1), minval=-brightness,
                                     maxval=brightness)
            do = jax.random.bernoulli(kb, p, (b, 1, 1, 1))
            x = jnp.where(do, x + amt, x)
        if c_str > 0:
            amt = log_uniform(kc, (b, 1, 1, 1), 1.0 / c_str, c_str)
            mean = x.mean(axis=(1, 2, 3), keepdims=True)
            do = jax.random.bernoulli(kc, p, (b, 1, 1, 1))
            x = jnp.where(do, (x - mean) * amt + mean, x)
        if s_str > 0:
            amt = log_uniform(ks, (b, 1, 1, 1), 1.0 / s_str, s_str)
            mean = x.mean(axis=-1, keepdims=True)
            do = jax.random.bernoulli(ks, p, (b, 1, 1, 1))
            x = jnp.where(do, (x - mean) * amt + mean, x)
        return x
    return fn
