"""DSA augmentation tests — semantics vs the documented torch math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_distillation_tpu.ops.augment import (ParamDiffAug,
                                                affine_grid_sample,
                                                dc_augment, diff_augment,
                                                get_daparam,
                                                make_diff_augment,
                                                rand_brightness, rand_crop,
                                                rand_cutout, rand_flip,
                                                rand_saturation, rand_scale)


def _x(b=4, h=16, w=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))


def test_affine_identity():
    x = _x()
    theta = jnp.broadcast_to(jnp.asarray([[1., 0., 0.], [0., 1., 0.]]),
                             (4, 2, 3))
    y = affine_grid_sample(x, theta)
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_affine_flip_equivalence():
    """theta = [[-1,0,0],[0,1,0]] mirrors x horizontally."""
    x = _x()
    theta = jnp.broadcast_to(jnp.asarray([[-1., 0., 0.], [0., 1., 0.]]),
                             (4, 2, 3))
    y = affine_grid_sample(x, theta)
    assert np.allclose(np.asarray(y), np.asarray(x[:, :, ::-1, :]),
                       atol=1e-5)


def test_flip_prob_one():
    x = _x()
    p = ParamDiffAug(prob_flip=1.0)
    y = rand_flip(x, jax.random.PRNGKey(0), p, jnp.asarray(False))
    assert np.allclose(np.asarray(y), np.asarray(x[:, :, ::-1, :]))


def test_brightness_shift_bounds():
    x = jnp.zeros((8, 4, 4, 3))
    p = ParamDiffAug()
    y = rand_brightness(x, jax.random.PRNGKey(0), p, jnp.asarray(False))
    assert float(jnp.abs(y).max()) <= 0.5  # (U[0,1]-0.5)*1.0


def test_saturation_grayscale_fixed_point():
    """A grayscale image (all channels equal) is invariant."""
    g = jnp.broadcast_to(_x(c=1), (4, 16, 16, 3))
    p = ParamDiffAug()
    y = rand_saturation(g, jax.random.PRNGKey(0), p, jnp.asarray(False))
    assert np.allclose(np.asarray(y), np.asarray(g), atol=1e-5)


def test_siamese_shares_params():
    x = jnp.stack([_x(b=1)[0]] * 6)  # identical images
    p = ParamDiffAug()
    for fn in (rand_scale, rand_crop, rand_cutout, rand_brightness):
        y = fn(x, jax.random.PRNGKey(3), p, jnp.asarray(True))
        y = np.asarray(y)
        for i in range(1, 6):
            assert np.allclose(y[i], y[0], atol=1e-5), fn.__name__


def test_cutout_zeroes_region():
    x = jnp.ones((2, 16, 16, 3))
    p = ParamDiffAug(ratio_cutout=0.5)
    y = np.asarray(rand_cutout(x, jax.random.PRNGKey(0), p,
                               jnp.asarray(False)))
    assert (y == 0).any()
    assert (y == 1).any()


def test_diff_augment_strategy_dispatch_and_jit():
    x = _x()
    fn = make_diff_augment("color_crop_cutout", ParamDiffAug())
    jfn = jax.jit(fn)
    y = jfn(jax.random.PRNGKey(0), x)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))
    # 'none' strategy is identity
    assert diff_augment(x, "none", jax.random.PRNGKey(0)) is x


def test_diff_augment_differentiable():
    x = _x()
    fn = make_diff_augment("scale_rotate", ParamDiffAug())

    def loss(x):
        return jnp.sum(fn(jax.random.PRNGKey(1), x) ** 2)

    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_dc_augment_and_daparam():
    p = get_daparam("MNIST", "ConvNet", "ConvNet", 1)
    assert p["strategy"] == "crop_scale_rotate"
    x = np.random.default_rng(0).normal(size=(4, 16, 16, 3)).astype(
        np.float32)
    y = dc_augment(x, p, np.random.default_rng(1))
    assert y.shape == x.shape
    assert get_daparam("CIFAR10", "ConvNet", "ConvNetBN", 1)["strategy"] == \
        "crop_noise"


def test_grid_shuffle_preserves_pixels():
    from video_distillation_tpu.ops.augment_extra import grid_shuffle
    x = _x(b=2, h=16, w=16)
    y = grid_shuffle(x, jax.random.PRNGKey(0), grid=4)
    assert y.shape == x.shape
    # pixel multiset preserved per sample
    for i in range(2):
        np.testing.assert_allclose(
            np.sort(np.asarray(x[i]).ravel()),
            np.sort(np.asarray(y[i]).ravel()), rtol=1e-6)


def test_gaussian_blur_smooths():
    from video_distillation_tpu.ops.augment_extra import gaussian_blur
    x = _x(b=2, h=16, w=16)
    y = gaussian_blur(x, sigma=2.0)
    assert float(jnp.var(y)) < float(jnp.var(x))
    # constant image is a fixed point
    c = jnp.ones((1, 16, 16, 3)) * 0.7
    np.testing.assert_allclose(np.asarray(gaussian_blur(c)), 0.7, rtol=1e-5)


def test_get_aug_by_name_chain():
    from video_distillation_tpu.ops.augment_extra import get_aug_by_name
    fn = get_aug_by_name("color_gridshuffle_blur")
    x = _x(b=4, h=16, w=16)
    y = fn(jax.random.PRNGKey(0), x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))
    ident = get_aug_by_name("none")
    np.testing.assert_array_equal(np.asarray(ident(jax.random.PRNGKey(0), x)),
                                  np.asarray(x))
