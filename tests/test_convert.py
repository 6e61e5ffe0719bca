"""drivers/convert.py — reference .pt <-> rebuild npy/npz roundtrips.

The torch side is exercised with the reference's OWN ConvNet3D /
Conv3DNet modules so the converted layouts are validated against the
real ``parameters()`` / ``state_dict()`` orders
(/root/reference/buffer.py:98-104, distill_s2d_ms.py:96-99,175-193,
utils.py:1178-1197), not a mock of them.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

# stub torchvision (imported at reference-utils module level; absent here)
if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tv.datasets = types.SimpleNamespace()
    tv.transforms = types.SimpleNamespace(
        Compose=lambda *a, **k: None, ToTensor=lambda *a, **k: None,
        Normalize=lambda *a, **k: None, Resize=lambda *a, **k: None)
    tv.utils = types.SimpleNamespace(save_image=lambda *a, **k: None)
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.datasets"] = tv.datasets
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.utils"] = tv.utils

from video_distillation_tpu.drivers import convert  # noqa: E402

IM, FR, NC = (64, 64), 8, 5  # min ConvNet3D shape — shared across tests


def _ref_convnet3d():
    import networks as ref_networks  # noqa (reference)

    torch.manual_seed(0)
    return ref_networks.ConvNet3D(
        channel=3, num_classes=NC, net_width=128, net_depth=3,
        net_act="relu", net_norm="none", net_pooling="maxpooling",
        frames=FR, im_size=IM)


def test_buffer_pt_roundtrip(tmp_path):
    net = _ref_convnet3d()
    snap = [p.detach().cpu() for p in net.parameters()]
    # 2 experts x 3 epochs, perturbed so every cell is distinct
    traj = [[[t + i + 10 * e for t in snap] for i in range(3)]
            for e in range(2)]
    src = os.path.join(tmp_path, "replay_buffer_0.pt")
    torch.save(traj, src)

    npz = os.path.join(tmp_path, "replay_buffer_0.npz")
    shape = convert.buffer_pt_to_npz(src, npz, "ConvNet3D", 3, NC, IM, FR)
    assert shape[:2] == (2, 3)

    back = os.path.join(tmp_path, "back.pt")
    convert.buffer_npz_to_pt(npz, back, "ConvNet3D", 3, NC, IM, FR)
    rt = torch.load(back, weights_only=False)
    for e in range(2):
        for i in range(3):
            for a, b in zip(traj[e][i], rt[e][i]):
                np.testing.assert_allclose(a.numpy(), b.numpy(), atol=1e-6)


def test_buffer_flat_matches_template_forward(tmp_path):
    """The converted flat vector, unravel'd and applied, reproduces the
    torch net's logits — i.e. a reference buffer truly trains the
    rebuild's MTT on the right parameters."""
    import jax
    import jax.numpy as jnp

    from video_distillation_tpu.distill.mtt import (TrajectoryBuffer,
                                                    flat_param_template)

    net = _ref_convnet3d().eval()
    snap = [p.detach().cpu() for p in net.parameters()]
    src = os.path.join(tmp_path, "replay_buffer_0.pt")
    torch.save([[snap]], src)
    npz = os.path.join(tmp_path, "replay_buffer_0.npz")
    convert.buffer_pt_to_npz(src, npz, "ConvNet3D", 3, NC, IM, FR)

    model_def, _, flat0, unravel = flat_param_template(
        "ConvNet3D", 3, NC, IM, FR)
    buf = TrajectoryBuffer.load(npz)
    assert buf.trajectories.shape == (1, 1, flat0.shape[0])
    theta = jnp.asarray(buf.trajectories[0, 0])

    x = np.random.default_rng(0).normal(
        size=(2, FR, IM[0], IM[1], 3)).astype(np.float32)
    logits = model_def.apply({"params": unravel(theta)}, jnp.asarray(x),
                             train=False)
    with torch.no_grad():
        ref = net(torch.from_numpy(np.transpose(x, (0, 1, 4, 2, 3))))
    np.testing.assert_allclose(np.asarray(logits), ref.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_static_roundtrip(tmp_path):
    img = np.random.default_rng(1).normal(size=(10, 3, 16, 16)).astype(
        np.float32)
    src = os.path.join(tmp_path, "images_best.pt")
    torch.save({"image": torch.from_numpy(img)}, src)
    npy = os.path.join(tmp_path, "images_best.npy")
    convert.static_pt_to_npy(src, npy)
    arr = np.load(npy)
    assert arr.shape == (10, 16, 16, 3)
    np.testing.assert_array_equal(arr, np.transpose(img, (0, 2, 3, 1)))

    back = os.path.join(tmp_path, "back.pt")
    convert.static_npy_to_pt(npy, back)
    rt = torch.load(back, weights_only=False)
    np.testing.assert_array_equal(rt["image"].numpy(), img)

    # raw-tensor save format (distill_baseline.py:144) also accepted
    torch.save(torch.from_numpy(img), src)
    convert.static_pt_to_npy(src, npy)
    np.testing.assert_array_equal(np.load(npy),
                                  np.transpose(img, (0, 2, 3, 1)))


def test_dynamic_roundtrip(tmp_path):
    dyn = np.random.default_rng(2).normal(size=(6, FR, 1, 16, 16)).astype(
        np.float32)
    src = os.path.join(tmp_path, "dynamic_best.pt")
    torch.save(torch.from_numpy(dyn), src)
    npy = os.path.join(tmp_path, "dynamic_best.npy")
    convert.dynamic_pt_to_npy(src, npy)
    arr = np.load(npy)
    assert arr.shape == (6, FR, 16, 16, 1)
    back = os.path.join(tmp_path, "back.pt")
    convert.dynamic_npy_to_pt(npy, back)
    np.testing.assert_array_equal(
        torch.load(back, weights_only=False).numpy(), dyn)


def test_hal_roundtrip_and_forward(tmp_path):
    """state_dict conversion validated against the reference Conv3DNet's
    own forward."""
    import utils as ref_utils  # noqa (reference)

    import jax.numpy as jnp

    from video_distillation_tpu.distill.s2d import hallucinate
    from video_distillation_tpu.models.hallucinator import Hallucinator
    from video_distillation_tpu.utils.checkpoint import load_pytree_artifact

    torch.manual_seed(3)
    hals = torch.nn.ModuleList([ref_utils.Conv3DNet(img_size=16)])
    src = os.path.join(tmp_path, "hal_best.pt")
    torch.save(hals.state_dict(), src)

    npz = os.path.join(tmp_path, "hal_best.npz")
    convert.hal_pt_to_npz(src, npz)

    # template: one flat {kernel,bias} dict per hallucinator
    hal_def = Hallucinator(mode="concat")
    import jax

    tmpl = hal_def.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1, FR, 16, 16, 1)))["params"]
    params = load_pytree_artifact(npz, [tmpl])

    rng = np.random.default_rng(4)
    static = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    dynamic = rng.normal(size=(2, FR, 16, 16, 1)).astype(np.float32)
    out = hallucinate(params[0], jnp.asarray(static), jnp.asarray(dynamic),
                      "concat")
    with torch.no_grad():
        ref = hals[0](torch.from_numpy(np.transpose(static, (0, 3, 1, 2))),
                      torch.from_numpy(np.transpose(dynamic,
                                                    (0, 1, 4, 2, 3))))
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(ref.numpy(), (0, 1, 3, 4, 2)),
                               atol=1e-4, rtol=1e-4)

    back = os.path.join(tmp_path, "back.pt")
    convert.hal_npz_to_pt(npz, back)
    rt = torch.load(back, weights_only=False)
    for k, v in hals.state_dict().items():
        np.testing.assert_allclose(rt[k].numpy(), v.numpy(), atol=1e-6)


def test_cli(tmp_path):
    img = np.random.default_rng(5).normal(size=(4, 3, 8, 8)).astype(
        np.float32)
    src = os.path.join(tmp_path, "images_0.pt")
    torch.save(torch.from_numpy(img), src)
    dst = os.path.join(tmp_path, "images_0.npy")
    convert.main([ "static", src, dst])
    assert np.load(dst).shape == (4, 8, 8, 3)
