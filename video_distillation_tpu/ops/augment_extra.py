"""Extra augmentation ops + chain builder — the augmax-equivalent layer.

The reference vendors a JAX augmentation library
(``/root/reference/FRePo/lib/dataset/augmax/``): warp-based geometric ops,
colorspace ops, image-level ops (Cutout, GridShuffle, blur) and an
``export.get_aug_by_name(strategy, res)`` glue that builds per-strategy
jitted vmapped transforms with a random strategy choice per batch
(``augmax/export.py:21-39``). The core DSA ops live in ``ops/augment.py``;
this module adds the remaining image-level ops and the chain builder.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .augment import AUGMENT_FNS, ParamDiffAug


def grid_shuffle(x, key, grid: int = 4):
    """Randomly permute a grid of patches (augmax imagelevel.GridShuffle).

    x: (B, H, W, C); H and W must be divisible by ``grid``.
    """
    b, h, w, c = x.shape
    gh, gw = h // grid, w // grid
    patches = x.reshape(b, grid, gh, grid, gw, c)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, grid * grid, gh, gw, c)
    perms = jax.vmap(lambda k: jax.random.permutation(k, grid * grid))(
        jax.random.split(key, b))
    shuffled = jnp.take_along_axis(
        patches, perms[:, :, None, None, None], axis=1)
    out = shuffled.reshape(b, grid, grid, gh, gw, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
    return out


def gaussian_blur(x, key=None, sigma: float = 1.0, kernel_size: int = 5):
    """Separable gaussian blur (augmax imagelevel blur), SAME padding."""
    r = kernel_size // 2
    coords = jnp.arange(-r, r + 1, dtype=jnp.float32)
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = g / g.sum()

    def blur_axis(img, axis):
        pad = [(0, 0)] * img.ndim
        pad[axis] = (r, r)
        padded = jnp.pad(img, pad, mode="edge")
        out = jnp.zeros_like(img)
        for i in range(kernel_size):
            sl = [slice(None)] * img.ndim
            sl[axis] = slice(i, i + img.shape[axis])
            out = out + g[i] * padded[tuple(sl)]
        return out

    return blur_axis(blur_axis(x, 1), 2)


def rand_grid_shuffle(x, key, param, siamese):
    del param, siamese
    return grid_shuffle(x, key)


def rand_blur(x, key, param, siamese):
    del siamese
    sigma = jax.random.uniform(key, ()) * 1.5 + 0.25
    # jit-friendly: fixed kernel size, traced sigma
    r = 2
    coords = jnp.arange(-r, r + 1, dtype=jnp.float32)
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    out = x
    for axis in (1, 2):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (r, r)
        padded = jnp.pad(out, pad, mode="edge")
        acc = jnp.zeros_like(out)
        for i in range(2 * r + 1):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(i, i + x.shape[axis])
            acc = acc + g[i] * padded[tuple(sl)]
        out = acc
    return out


EXTRA_FNS = {
    "gridshuffle": [rand_grid_shuffle],
    "blur": [rand_blur],
}


def get_aug_by_name(strategy: str, res: int = 32,
                    param: ParamDiffAug | None = None):
    """augmax/export.py:21-39 equivalent: build a jitted transform applying
    ONE random strategy from the chain per call (batched ops with
    per-sample draws — the use_siamese=False vmap of the reference).

    The per-strategy op configuration matches export.get_aug_by_name:
    color=NormalizedColorJitter(0.25,0.25,0.25,p=1),
    crop=RandomSizedCrop(res, zoom (0.8,1.25)), translate=RandomTranslate
    (0.125), cutout=Cutout(1, res//4, res//4), flip=HorizontalFlip(0.5),
    rotate=Rotate(+-15). Extra names (gridshuffle/blur + the DSA six) keep
    resolving through the DSA table.
    """
    param = param or ParamDiffAug()
    if strategy in ("None", "none", ""):
        return jax.jit(lambda key, x: x)
    from . import augmax_ops as am

    augmax_table = {
        "color": am.normalized_color_jitter(0.25, 0.25, 0.25, p=1.0),
        "crop": am.random_sized_crop(res, res, zoom_range=(0.8, 1.25)),
        "translate": am.random_translate(0.125),
        "cutout": am.cutout(1, res // 4, res // 4, 0.0, p=1.0),
        "flip": am.horizontal_flip(0.5),
        "rotate": am.rotate((-15, 15), p=1.0),
    }
    names = strategy.split("_")
    dsa_table = {**AUGMENT_FNS, **EXTRA_FNS}

    def apply_one(name, key, x):
        if name in augmax_table:
            return augmax_table[name](key, x)
        for f in dsa_table[name]:
            key, k = jax.random.split(key)
            x = f(x, k, param, jnp.asarray(False))
        return x

    branches = [partial(apply_one, n) for n in names]

    def fn(key, x):
        kc, key = jax.random.split(key)
        idx = jax.random.randint(kc, (), 0, len(branches))
        return jax.lax.switch(idx, [partial(b, key) for b in branches], x)

    return jax.jit(fn)
