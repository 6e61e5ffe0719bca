"""Numeric goldens against the torch reference (SURVEY.md §7).

Imports the reference's own modules (CPU torch) from /root/reference and
asserts the rebuilt JAX ops match on identical inputs/weights:

* ConvNet3D forward logits with ported weights (networks.py:727-814)
* DM loss on fixed inputs (distill_baseline.py:343-351)
* one MTT inner SGD step (distill_baseline.py:231-252) + the normalized
  grand loss (:255-272)
* each DSA op under identical random draws (utils.py:1049-1165) via a
  shared patched RNG stream
* affine grid-sample core vs F.affine_grid/F.grid_sample

The reference's utils.py imports torchvision (absent in this image), so a
minimal stub module is installed before import; only the DSA functions are
exercised, which touch no torchvision symbol.
"""

import sys
import types
import unittest.mock as mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

# stub torchvision (only referenced inside reference functions we don't call)
if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tv.datasets = types.SimpleNamespace()
    tv.transforms = types.SimpleNamespace(
        Compose=lambda *a, **k: None, ToTensor=lambda *a, **k: None,
        Normalize=lambda *a, **k: None, Resize=lambda *a, **k: None,
        CenterCrop=lambda *a, **k: None)
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.datasets"] = tv.datasets  # type: ignore
    sys.modules["torchvision.transforms"] = tv.transforms  # type: ignore

import networks as ref_networks  # noqa: E402  (from /root/reference)
import utils as ref_utils  # noqa: E402

from video_distillation_tpu.models import ConvNet3D  # noqa: E402

C, NC, W_, D_, FR = 3, 4, 128, 3, 8
IM = (64, 64)


def build_pair(seed=0):
    """(torch ConvNet3D, flax ConvNet3D, ported flax params)."""
    torch.manual_seed(seed)
    tnet = ref_networks.ConvNet3D(C, NC, W_, D_, "relu", "none",
                                  "maxpooling", FR, im_size=IM)
    tnet.eval()

    model = ConvNet3D(channel=C, num_classes=NC, net_width=W_,
                      net_depth=D_, frames=FR, im_size=IM)
    k = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, FR, IM[0], IM[1], C))
    params = model.init({"params": k, "dropout": k}, sample,
                        train=False)["params"]

    def port(w):  # torch Conv3d (O,I,D,H,W) -> flax DHWIO
        return jnp.asarray(w.detach().numpy().transpose(2, 3, 4, 1, 0))

    import flax
    convs = [m for m in tnet.features if isinstance(m, torch.nn.Conv3d)]
    params = flax.core.unfreeze(params)
    params["TemporalIm2ColConv_0"] = {
        "kernel": port(convs[0].weight),
        "bias": jnp.asarray(convs[0].bias.detach().numpy())}
    for i, conv in enumerate(convs[1:]):
        params[f"TemporalIm2ColConv_{i + 1}"] = {
            "kernel": port(conv.weight),
            "bias": jnp.asarray(conv.bias.detach().numpy())}
    params["TorchConv_0"] = {"Conv_0": {
        "kernel": port(tnet.logit.weight),
        "bias": jnp.asarray(tnet.logit.bias.detach().numpy())}}
    return tnet, model, params


def to_jax(xt):  # torch (B,F,C,H,W) -> jax (B,F,H,W,C)
    return jnp.asarray(xt.detach().numpy().transpose(0, 1, 3, 4, 2))


@pytest.fixture(scope="module")
def pair():
    return build_pair()


def test_convnet3d_forward_logits(pair):
    tnet, model, params = pair
    torch.manual_seed(1)
    xt = torch.randn(2, FR, C, IM[0], IM[1])
    with torch.no_grad():
        ref = tnet(xt).numpy()
    got = np.asarray(model.apply({"params": params}, to_jax(xt),
                                 train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_dm_loss_golden(pair):
    """distill_baseline.py:343-351 on fixed real/syn batches."""
    tnet, model, params = pair
    torch.manual_seed(2)
    ipc, batch_real = 2, 3
    real_t = torch.randn(NC, batch_real, FR, C, IM[0], IM[1])
    syn_t = torch.randn(NC, ipc, FR, C, IM[0], IM[1])
    with torch.no_grad():
        loss_ref = torch.tensor(0.0)
        for c in range(NC):
            out_r = tnet.embed(real_t[c])
            out_s = tnet.embed(syn_t[c])
            loss_ref += torch.sum(
                (out_r.mean(dim=0) - out_s.mean(dim=0)) ** 2)
    loss_ref = float(loss_ref)

    def embed(x5):
        return model.apply({"params": params}, x5, train=False,
                           output="feat")

    fr = embed(to_jax(real_t.reshape(-1, FR, C, IM[0], IM[1])))
    fs = embed(to_jax(syn_t.reshape(-1, FR, C, IM[0], IM[1])))
    fr = fr.reshape(NC, batch_real, -1).mean(axis=1)
    fs = fs.reshape(NC, ipc, -1).mean(axis=1)
    loss_got = float(jnp.sum((fr - fs) ** 2))
    # feature order differs (NDHWC vs NCDHW flatten) but the sum of squared
    # per-feature differences is permutation invariant
    np.testing.assert_allclose(loss_got, loss_ref, rtol=2e-4)


def test_mtt_inner_step_and_grand_loss(pair):
    """One inner step theta' = theta - lr*grad(CE) (distill_baseline.py:
    231-252) compared per-layer; grand loss normalization (:255-272)."""
    tnet, model, params = pair
    torch.manual_seed(3)
    xt = torch.randn(5, FR, C, IM[0], IM[1])
    yt = torch.randint(0, NC, (5,))
    lr = 0.02

    tparams = [p for p in tnet.parameters()]
    logits = tnet(xt)
    ce = torch.nn.functional.cross_entropy(logits, yt)
    grads = torch.autograd.grad(ce, tparams)
    updated_t = [p - lr * g for p, g in zip(tparams, grads)]

    x = to_jax(xt)
    y = jnp.asarray(yt.numpy())

    def ce_fn(p):
        lg = model.apply({"params": p}, x, train=False)
        logp = jax.nn.log_softmax(lg, axis=-1)
        return -jnp.take_along_axis(logp, y[:, None], axis=-1).mean()

    ce_j, g = jax.value_and_grad(ce_fn)(params)
    np.testing.assert_allclose(float(ce_j), float(ce), rtol=1e-4)
    upd = jax.tree.map(lambda p_, g_: p_ - lr * g_, params, g)

    convs = [m for m in tnet.features if isinstance(m, torch.nn.Conv3d)]
    name_of = {id(c.weight): i for i, c in enumerate(convs)}

    def port(w):
        return w.detach().numpy().transpose(2, 3, 4, 1, 0)

    # first conv
    tw = updated_t[0]  # conv order matches parameters() order
    np.testing.assert_allclose(
        np.asarray(upd["TemporalIm2ColConv_0"]["kernel"]), port(tw),
        rtol=1e-3, atol=1e-5)
    # logit conv bias (last param)
    np.testing.assert_allclose(
        np.asarray(upd["TorchConv_0"]["Conv_0"]["bias"]),
        updated_t[-1].detach().numpy(), rtol=1e-3, atol=1e-6)

    # grand loss normalization on the flattened params
    from jax.flatten_util import ravel_pytree
    th_start, _ = ravel_pytree(params)
    th_final, _ = ravel_pytree(upd)
    th_target, _ = ravel_pytree(jax.tree.map(
        lambda a: a + 0.01 * jnp.ones_like(a), params))
    got = float(jnp.sum((th_final - th_target) ** 2) /
                jnp.sum((th_start - th_target) ** 2))
    s = torch.cat([p.reshape(-1) for p in tparams])
    f = torch.cat([p.reshape(-1) for p in updated_t])
    t = s + 0.01
    ref = float(TF.mse_loss(f, t, reduction="sum") /
                TF.mse_loss(s, t, reduction="sum"))
    np.testing.assert_allclose(got, ref, rtol=1e-3)


# ---------------------------------------------------------------------------
# DSA ops under identical random draws
# ---------------------------------------------------------------------------

class _FakeTorchRand:
    def __init__(self, seed):
        self.rng = np.random.default_rng(seed)

    def rand(self, *size, **kw):
        if len(size) == 1 and isinstance(size[0], (tuple, list)):
            size = tuple(size[0])
        return torch.from_numpy(
            self.rng.random(size, dtype=np.float64).astype(np.float32))

    def randint(self, low, high, size=(), **kw):
        return torch.from_numpy(
            self.rng.integers(low, high, tuple(size)).astype(np.int64))


class _FakeJaxRand:
    def __init__(self, seed):
        self.rng = np.random.default_rng(seed)

    def uniform(self, key, shape=(), dtype=None, minval=0.0, maxval=1.0):
        u = self.rng.random(shape, dtype=np.float64).astype(np.float32)
        return jnp.asarray(u * (maxval - minval) + minval)

    def randint(self, key, shape, minval, maxval, dtype=jnp.int32):
        return jnp.asarray(
            self.rng.integers(int(minval), int(maxval), tuple(shape)),
            dtype=dtype)


DSA_OPS = ["brightness", "saturation", "contrast", "crop", "cutout",
           "flip", "scale", "rotate"]


@pytest.mark.parametrize("op", DSA_OPS)
def test_dsa_op_parity(op):
    from video_distillation_tpu.ops import augment as jaug

    torch.manual_seed(4)
    b, h, w = 5, 16, 16
    xt = torch.randn(b, C, h, w)
    xj = jnp.asarray(xt.numpy().transpose(0, 2, 3, 1))

    ref_fn = {"brightness": ref_utils.rand_brightness,
              "saturation": ref_utils.rand_saturation,
              "contrast": ref_utils.rand_contrast,
              "crop": ref_utils.rand_crop,
              "cutout": ref_utils.rand_cutout,
              "flip": ref_utils.rand_flip,
              "scale": ref_utils.rand_scale,
              "rotate": ref_utils.rand_rotate}[op]
    jax_fn = {"brightness": jaug.rand_brightness,
              "saturation": jaug.rand_saturation,
              "contrast": jaug.rand_contrast,
              "crop": jaug.rand_crop,
              "cutout": jaug.rand_cutout,
              "flip": jaug.rand_flip,
              "scale": jaug.rand_scale,
              "rotate": jaug.rand_rotate}[op]

    param = ref_utils.ParamDiffAug()
    param.Siamese = False
    param.latestseed = -1  # disable reseeding; we patch the draws

    fk = _FakeTorchRand(seed=99)
    with mock.patch.object(torch, "rand", fk.rand), \
            mock.patch.object(torch, "randint", fk.randint):
        ref = ref_fn(xt.clone(), param).detach().numpy()

    fj = _FakeJaxRand(seed=99)
    with mock.patch.object(jax.random, "uniform", fj.uniform), \
            mock.patch.object(jax.random, "randint", fj.randint):
        got = np.asarray(jax_fn(xj, jax.random.PRNGKey(0),
                                jaug.ParamDiffAug(), jnp.asarray(False)))

    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_affine_grid_sample_matches_torch():
    from video_distillation_tpu.ops.augment import affine_grid_sample

    torch.manual_seed(5)
    b, h, w = 3, 16, 16
    xt = torch.randn(b, C, h, w)
    theta = torch.tensor([[[0.9, 0.1, 0.05], [-0.1, 1.1, -0.02]]] * b)
    grid = TF.affine_grid(theta, xt.shape, align_corners=False)
    ref = TF.grid_sample(xt, grid, align_corners=False).numpy()

    got = np.asarray(affine_grid_sample(
        jnp.asarray(xt.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(theta.numpy())))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)
