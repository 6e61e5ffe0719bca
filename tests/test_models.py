"""Model zoo shape / semantics tests.

The reference has no tests; shape expectations here are derived from the
documented torch architectures (see docstrings in each model module).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_distillation_tpu.models import (ConvNet3D, Hallucinator,
                                           create_model, get_eval_pool,
                                           init_model, is_video_model,
                                           sample_input)


def _run(model_name, channel=3, num_classes=10, im_size=(32, 32), frames=8,
         batch=2):
    model = create_model(model_name, channel, num_classes, im_size, frames)
    x = sample_input(model_name, channel, im_size, frames, batch)
    params, extra = init_model(model, jax.random.PRNGKey(0), x)
    out = model.apply({"params": params, **extra}, x, train=False)
    return model, params, out


@pytest.mark.parametrize("name", [
    "MLP", "ConvNet", "LeNet", "AlexNet", "AlexNetBN", "VGG11", "VGG11BN",
    "ResNet18", "ResNet18BN", "ResNet18BN_AP",
    "ConvNetD1", "ConvNetD2", "ConvNetD4", "ConvNetW32", "ConvNetW256",
    "ConvNetAS", "ConvNetAL", "ConvNetASwish", "ConvNetASwishBN",
    "ConvNetNN", "ConvNetBN", "ConvNetLN", "ConvNetIN", "ConvNetGN",
    "ConvNetNP", "ConvNetMP", "ConvNetAP",
])
def test_image_models_logits_shape(name):
    _, _, out = _run(name)
    assert out.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("name", [
    "VideoConvNetMean", "VideoConvNetMLP", "VideoConvNetLSTM",
    "VideoConvNetRNN", "VideoConvNetGRU", "ConvNet3D",
])
def test_video_models_logits_shape(name):
    # ConvNet3D needs >= 64px (three stride-2 convs + pools; same as torch)
    size = (64, 64) if name == "ConvNet3D" else (32, 32)
    _, _, out = _run(name, im_size=size, frames=8)
    assert out.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(out)))


def test_convnet3d_112_shapes():
    """112x112x16 videos — the miniUCF101/HMDB51 flagship configuration."""
    model = ConvNet3D(channel=3, num_classes=50, frames=16, im_size=(112, 112))
    x = jnp.zeros((2, 16, 112, 112, 3))
    params, _ = init_model(model, jax.random.PRNGKey(0), x)
    logits = model.apply({"params": params}, x, train=False)
    assert logits.shape == (2, 50)
    feat = model.apply({"params": params}, x, train=False, output="feat")
    # backbone features: T=4, H=W=2, C=128 (see convnet3d.py docstring)
    assert feat.shape == (2, 4 * 2 * 2 * 128)


def test_convnet3d_64_shapes():
    """64x64x8 — the K400/SSv2 configuration (head window (2,1,1))."""
    model = ConvNet3D(channel=3, num_classes=400, frames=8, im_size=(64, 64))
    x = jnp.zeros((2, 8, 64, 64, 3))
    params, _ = init_model(model, jax.random.PRNGKey(0), x)
    logits = model.apply({"params": params}, x, train=False)
    assert logits.shape == (2, 400)


def test_convnet3d_param_count_112():
    """Parameter count must match the torch reference architecture.

    conv1: 3*64*3*7*7+64; conv2: 64*128*3*7*7+128; conv3: 128*128*3*7*7+128;
    logit: 128*C*1+C.
    """
    model = ConvNet3D(channel=3, num_classes=50, frames=16, im_size=(112, 112))
    x = jnp.zeros((1, 16, 112, 112, 3))
    params, _ = init_model(model, jax.random.PRNGKey(0), x)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    expected = (3 * 64 * 3 * 7 * 7 + 64) + (64 * 128 * 3 * 7 * 7 + 128) + \
               (128 * 128 * 3 * 7 * 7 + 128) + (128 * 50 + 50)
    assert n == expected


def test_convnet3d_dropout_stochastic_in_train():
    model = ConvNet3D(channel=3, num_classes=10, frames=8, im_size=(64, 64))
    x = jnp.ones((2, 8, 64, 64, 3))
    params, _ = init_model(model, jax.random.PRNGKey(0), x)
    a = model.apply({"params": params}, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    b = model.apply({"params": params}, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    c = model.apply({"params": params}, x, train=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert np.all(np.isfinite(np.asarray(c)))


def test_torch_init_distribution():
    """Conv weights must follow U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    model = ConvNet3D(channel=3, num_classes=10, frames=8, im_size=(64, 64))
    x = jnp.zeros((1, 8, 64, 64, 3))
    params, _ = init_model(model, jax.random.PRNGKey(3), x)
    # locate first conv kernel: shape (3,7,7,3,64) -> fan_in = 3*7*7*3
    kernels = [np.asarray(v) for v in jax.tree.leaves(params)
               if v.ndim == 5 and v.shape[-2] == 3]
    k = kernels[0]
    bound = 1.0 / np.sqrt(3 * 3 * 7 * 7)
    assert np.abs(k).max() <= bound + 1e-6
    assert np.abs(k).max() > 0.8 * bound  # actually fills the range


def test_embed_both_consistency():
    model, params, _ = _run("ConvNet")
    x = jnp.ones((2, 32, 32, 3))
    logits, feat = model.apply({"params": params}, x, train=False,
                               output="both")
    feat2 = model.apply({"params": params}, x, train=False, output="feat")
    assert np.allclose(np.asarray(feat), np.asarray(feat2))
    assert logits.shape == (2, 10)


def test_hallucinator_shapes():
    hal = Hallucinator()
    static = jnp.ones((4, 16, 16, 3))
    dynamic = jnp.ones((4, 8, 16, 16, 1))
    params, _ = init_model(hal, jax.random.PRNGKey(0), None) if False else (
        hal.init(jax.random.PRNGKey(0), static, dynamic)["params"], None)
    video = hal.apply({"params": params}, static, dynamic)
    assert video.shape == (4, 8, 16, 16, 3)


def _naive_hallucinate(kernel, bias, static, dynamic, mode):
    """Reference semantics: broadcast + concat/add + Conv3d k=3 pad=1
    (utils.py:1178-1197)."""
    b, f = dynamic.shape[:2]
    static_b = jnp.broadcast_to(static[:, None], (b, f) + static.shape[1:])
    x = (jnp.concatenate([static_b, dynamic], axis=-1)
         if mode == "concat" else static_b + dynamic)
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1, 1), padding=((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + bias


@pytest.mark.parametrize("mode", ["concat", "add"])
def test_hallucinator_split_matches_naive_conv3d(mode):
    key = jax.random.PRNGKey(3)
    hal = Hallucinator(mode=mode)
    static = jax.random.normal(jax.random.fold_in(key, 1), (2, 16, 16, 3))
    dynamic = jax.random.normal(jax.random.fold_in(key, 2),
                                (2, 8, 16, 16, 1))
    params = hal.init(key, static, dynamic)["params"]
    out = hal.apply({"params": params}, static, dynamic)
    ref = _naive_hallucinate(np.asarray(params["kernel"]),
                             np.asarray(params["bias"]), static, dynamic,
                             mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_eval_pool_modes():
    assert get_eval_pool("S", "ConvNet3D") == ["ConvNet3D"]
    assert get_eval_pool("S", "ConvNetBN") == ["ConvNet"]
    assert get_eval_pool("SS", "ConvNetBN") == ["ConvNetBN"]
    assert len(get_eval_pool("M", "ConvNet")) == 6
    assert get_eval_pool("top5", "ConvNet3D") == ["ConvNet3D"]
    assert is_video_model("ConvNet3D") and not is_video_model("ConvNet")


def test_temporal_conv_sum_path_matches_conv3d():
    """The wide-channel shifted-sum formulation (layers.py) must equal the
    direct Conv3d k=(3,7,7) s=(1,2,2) p=(1,3,3)."""
    import jax.numpy as jnp
    from video_distillation_tpu.models.layers import TemporalIm2ColConv

    B, F, H, W, C, O = 2, 8, 28, 28, 64, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (B, F, H, W, C)) * 0.1
    mod = TemporalIm2ColConv(features=O)
    params = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(params, x)
    k = params["params"]["kernel"]
    b = params["params"]["bias"]
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 2, 2), ((1, 1), (3, 3), (3, 3)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    assert float(jnp.max(jnp.abs(y - ref))) < 1e-5


@pytest.mark.parametrize("s2d_mode", ["direct10", "s2d2", "s2d4"])
def test_fused_first_stage_matches_unfused(s2d_mode, monkeypatch):
    """fuse_pool (space-to-depth conv + phase max) == conv -> relu ->
    (2,2) spatial max-pool, values and gradients, in both s2d packings."""
    import jax.numpy as jnp
    from video_distillation_tpu.models import layers
    from video_distillation_tpu.models.layers import (TemporalIm2ColConv,
                                                      max_pool)

    monkeypatch.setattr(layers, "S2D_POOL_MODE", s2d_mode)
    B, F, H, W, O = 2, 8, 64, 64, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, F, H, W, 3))
    mod_f = TemporalIm2ColConv(features=O, fuse_pool=True)
    mod_u = TemporalIm2ColConv(features=O, fuse_pool=False)
    params = mod_u.init(jax.random.PRNGKey(1), x)
    yu = max_pool(jax.nn.relu(mod_u.apply(params, x)), (1, 2, 2))
    yf = jax.nn.relu(mod_f.apply(params, x))
    assert float(jnp.max(jnp.abs(yu - yf))) < 1e-5

    gu = jax.grad(lambda p: (max_pool(jax.nn.relu(mod_u.apply(p, x)),
                                      (1, 2, 2)) ** 2).sum())(params)
    gf = jax.grad(lambda p: (jax.nn.relu(mod_f.apply(p, x)) ** 2).sum())(
        params)
    for kname in ("kernel", "bias"):
        a = gu["params"][kname]
        b = gf["params"][kname]
        assert float(jnp.linalg.norm(a - b) /
                     (jnp.linalg.norm(a) + 1e-30)) < 1e-5


def test_convnet3d_packed_input_matches_raw(monkeypatch):
    """ConvNet3D(packed_input=True) over s2d2_pack'ed batches must equal
    the raw-input model with the SAME params (the MTT unroll stages
    batches pre-packed; expert trajectories come from raw training).
    The pre-packed capability is specific to the s2d2 formulation (the
    default first stage is the pack-free direct10), so pin the mode."""
    from video_distillation_tpu.models import layers
    from video_distillation_tpu.models.layers import s2d2_pack

    monkeypatch.setattr(layers, "S2D_POOL_MODE", "s2d2")
    model = ConvNet3D(num_classes=5, frames=8, im_size=(64, 64))
    assert ConvNet3D.supports_packed_input(im_size=(64, 64))
    packed = model.clone(packed_input=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 64, 64, 3))
    k = jax.random.PRNGKey(1)
    params = model.init({"params": k, "dropout": k}, x,
                        train=False)["params"]
    ref = model.apply({"params": params}, x, train=False)
    out = packed.apply({"params": params}, s2d2_pack(x), train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_max_pool_pairmax_matches_reduce_window():
    import jax.numpy as jnp
    import flax.linen as nn
    from video_distillation_tpu.models.layers import max_pool

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 9, 9, 4))
    for win in [(1, 2, 2), (2, 2, 2)]:
        a = max_pool(x, win)
        b = nn.max_pool(x, win, strides=win, padding="VALID")
        assert a.shape == b.shape
        assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_fp32_stage_islands():
    """fp32_stages islands (the bf16-HVP overflow-localization knob,
    mtt.py VD_HVP_FP32_STAGES) change only rounding: an empty context is
    a graph no-op, an island keeps its stage fp32 and the next boundary
    casts back to the compute dtype."""
    import jax.numpy as jnp
    from video_distillation_tpu.models import layers

    model = ConvNet3D(num_classes=4, frames=8, im_size=(64, 64))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 64, 64, 3))
    k = jax.random.PRNGKey(1)
    params = model.init({"params": k, "dropout": k}, x,
                        train=False)["params"]
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    xb = x.astype(jnp.bfloat16)

    base = model.apply({"params": pb}, xb, train=False)
    with layers.fp32_stages(()):
        empty = model.apply({"params": pb}, xb, train=False)
    assert empty.dtype == base.dtype
    assert float(jnp.max(jnp.abs((empty - base).astype(jnp.float32)))) == 0

    with layers.fp32_stages(("s2",)):
        isl = model.apply({"params": pb}, xb, train=False)
    # s3 boundary casts back -> logits stay in the compute dtype
    assert isl.dtype == base.dtype
    # islands only change rounding, not math
    diff = float(jnp.max(jnp.abs((isl.astype(jnp.float32)
                                  - base.astype(jnp.float32)))))
    assert diff < 0.05

    with layers.fp32_stages(("head",)):
        hd = model.apply({"params": pb}, xb, train=False)
    # no later boundary: head island propagates fp32 to the logits
    assert hd.dtype == jnp.float32
