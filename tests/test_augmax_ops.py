"""Distribution/semantics tests for the augmax-equivalent op surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_distillation_tpu.ops import augmax_ops as am

B, H, W = 8, 16, 16
KEY = jax.random.PRNGKey(0)


def _img():
    return jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3))


def test_horizontal_flip_distribution():
    x = _img()
    out = am.horizontal_flip(0.5)(KEY, x)
    flipped = np.asarray(out) == np.asarray(x[:, :, ::-1, :])
    same = np.asarray(out) == np.asarray(x)
    per = [bool(flipped[i].all() or same[i].all()) for i in range(B)]
    assert all(per)
    assert any(flipped[i].all() for i in range(B))


def test_vertical_and_random_flip():
    x = _img()
    outv = am.vertical_flip(1.0)(KEY, x)
    np.testing.assert_array_equal(np.asarray(outv),
                                  np.asarray(x[:, ::-1, :, :]))
    outr = am.random_flip(1.0)(KEY, x)
    for i in range(B):
        oi = np.asarray(outr[i])
        assert (np.allclose(oi, np.asarray(x[i, :, ::-1])) or
                np.allclose(oi, np.asarray(x[i, ::-1, :])))


def test_rotate90_exact():
    x = _img()
    out = np.asarray(am.rotate90()(KEY, x))
    cands = [np.asarray(x), np.asarray(jnp.rot90(x, 1, axes=(1, 2))),
             np.asarray(jnp.rot90(x, 2, axes=(1, 2))),
             np.asarray(jnp.rot90(x, 3, axes=(1, 2)))]
    for i in range(B):
        assert any(np.allclose(out[i], c[i]) for c in cands)


def test_rotate_identity_at_zero():
    x = _img()
    out = am.rotate((0.0, 1e-9), p=1.0)(KEY, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_translate_shifts_pixels():
    x = jnp.zeros((1, H, W, 3)).at[0, 4, 4].set(1.0)
    out = np.asarray(am.translate(dx=2, dy=3)(KEY, x))
    assert out[0, 7, 6, 0] == pytest.approx(1.0, abs=1e-5)


def test_random_translate_stays_bounded():
    x = _img()
    out = am.random_translate(0.125)(KEY, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_center_crop_and_resize_shapes():
    x = _img()
    cc = am.center_crop(8, 8)(KEY, x)
    assert cc.shape == (B, 8, 8, 3)
    # center crop of the center region equals the slice
    np.testing.assert_allclose(np.asarray(cc), np.asarray(x[:, 4:12, 4:12]),
                               atol=1e-5)
    rs = am.resize(8, 8)(KEY, x)
    assert rs.shape == (B, 8, 8, 3)
    rc = am.random_crop(8, 8)(KEY, x)
    assert rc.shape == (B, 8, 8, 3)


def test_corner_crop_equals_slice():
    x = _img()
    out = am.crop(3, 2, 8, 8)(KEY, x)  # x0=3, y0=2, w=8, h=8
    assert out.shape == (B, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x[:, 2:10, 3:11]), atol=1e-5)


def test_random_sized_crop_preserves_range():
    x = _img()
    out = am.random_sized_crop(H, H, zoom_range=(0.8, 1.25))(KEY, x)
    assert out.shape == x.shape
    o = np.asarray(out)
    assert o.min() >= -1e-5 and o.max() <= 1.0 + 1e-5


def test_warp_smooth_displacement():
    x = _img()
    out = am.warp(strength=1.0, coarseness=8)(KEY, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # zero strength is the identity
    out0 = am.warp(strength=0.0, coarseness=8)(KEY, x)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x), atol=1e-5)


def test_byte_to_float_and_normalize():
    xb = (255 * _img()).astype(jnp.uint8)
    xf = am.byte_to_float()(KEY, xb)
    assert xf.dtype == jnp.float32 and float(xf.max()) <= 1.0
    xn = am.normalize((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))(KEY, xf)
    np.testing.assert_allclose(np.asarray(xn), np.asarray(xf) * 2 - 1,
                               rtol=1e-5, atol=1e-6)


def test_channel_shuffle_permutes():
    x = _img()
    out = np.asarray(am.channel_shuffle(1.0)(KEY, x))
    xs = np.asarray(x)
    for i in range(B):
        got = {tuple(np.round(out[i, ..., c].ravel()[:5], 5))
               for c in range(3)}
        want = {tuple(np.round(xs[i, ..., c].ravel()[:5], 5))
                for c in range(3)}
        assert got == want


def test_random_gamma_monotone():
    x = _img()
    out = am.random_gamma((0.5, 2.0), p=1.0)(KEY, x)
    # gamma preserves order within each image
    i = np.argsort(np.asarray(x[0, :, :, 0]).ravel())
    o = np.asarray(out[0, :, :, 0]).ravel()[i]
    assert (np.diff(o) >= -1e-6).all()


def test_brightness_contrast_stats():
    x = _img()
    ob = am.random_brightness(0.5, p=1.0)(KEY, x)
    d = np.asarray(ob - x)
    for i in range(B):  # constant shift per sample
        assert d[i].std() < 1e-5
        assert abs(d[i].mean()) <= 0.5 + 1e-6
    oc = am.random_contrast(0.5, p=1.0)(KEY, x)
    np.testing.assert_allclose(np.asarray(oc.mean(axis=(1, 2, 3))),
                               np.asarray(x.mean(axis=(1, 2, 3))),
                               atol=1e-5)


def test_hsv_roundtrip():
    x = _img()
    h, s, v = am.rgb_to_hsv(x)
    back = am.hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_color_jitter_runs_and_bounded():
    x = _img()
    out = am.color_jitter(p=1.0)(KEY, x)
    o = np.asarray(out)
    assert o.shape == x.shape and np.isfinite(o).all()
    assert o.min() >= -1e-5 and o.max() <= 1.0 + 1e-5


def test_random_grayscale_channels_equal():
    x = _img()
    out = np.asarray(am.random_grayscale(1.0)(KEY, x))
    np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-6)
    np.testing.assert_allclose(out[..., 1], out[..., 2], atol=1e-6)


def test_solarize_inverts_above_threshold():
    x = _img()
    out = np.asarray(am.solarize(0.5, p=1.0)(KEY, x))
    xs = np.asarray(x)
    hi = xs > 0.5
    np.testing.assert_allclose(out[hi], 1.0 - xs[hi], atol=1e-6)
    np.testing.assert_allclose(out[~hi], xs[~hi], atol=1e-6)


def test_cutout_zeroes_rectangle():
    x = jnp.ones((B, H, W, 3))
    out = np.asarray(am.cutout(1, 4, 4, 0.0, p=1.0)(KEY, x))
    nz = (out == 0).reshape(B, -1).sum(1)
    assert (nz > 0).all() and (nz <= 4 * 4 * 3).all()


def test_normalized_color_jitter_matches_dc_semantics():
    x = _img() * 4 - 2  # normalized-space values
    out = am.normalized_color_jitter(0.25, 0.25, 0.25, p=1.0)(KEY, x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_export_strategy_strings_resolve():
    """Every strategy name from augmax/export.py:21-39 must resolve."""
    from video_distillation_tpu.ops.augment_extra import get_aug_by_name

    x = _img()
    for name in ("color", "crop", "translate", "cutout", "flip", "rotate",
                 "color_crop_cutout_flip_scale_rotate",
                 "flip_color_crop_cutout", "translate_gridshuffle_blur"):
        fn = get_aug_by_name(name, res=H)
        out = fn(KEY, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
