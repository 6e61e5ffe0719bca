"""Multi-device tests on the virtual 8-device CPU mesh."""

import sys

import jax
import numpy as np
import pytest


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_mesh_and_data_sharding():
    from video_distillation_tpu.parallel import (data_sharding, make_mesh,
                                                 shard_batch)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    xd = shard_batch(mesh, x)
    assert xd.sharding.is_equivalent_to(data_sharding(mesh), ndim=2)
    np.testing.assert_array_equal(np.asarray(xd), x)


@pytest.mark.slow
def test_graft_dryrun_multichip():
    # the driver runs this itself every round; here it is compile-bound
    # (minutes with a cold cache) so it stays out of the fast subset
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 50)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pad_and_shard_plan_pads_and_masks():
    from video_distillation_tpu.parallel import pad_and_shard_plan

    plan = np.arange(2 * 5, dtype=np.int32).reshape(2, 5)  # 5 % 8 != 0
    out = pad_and_shard_plan(plan)
    assert out.shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(out)[:, :5], plan)
    assert (np.asarray(out)[:, 5:] == -1).all()
    # sharded over the data axis, not replicated
    from video_distillation_tpu.parallel import data_sharding, get_mesh
    assert not out.sharding.is_fully_replicated


def test_sharded_dm_step_matches_replicated():
    """A DM outer step with sharded per-class indices must equal the
    replicated-placement run (same inputs)."""
    import jax.numpy as jnp
    from video_distillation_tpu.distill.dm import _build_dm_step
    from video_distillation_tpu.parallel import (get_mesh, replicate_array,
                                                 shard_divisible)

    C_, B_, F_, IM = 4, 8, 8, (64, 64)
    step = _build_dm_step("ConvNet3D", 3, C_, IM, F_, ipc=1, batch_real=B_,
                          lr_img=1.0, compute_dtype="float32")
    rng = np.random.default_rng(0)
    clips = rng.integers(0, 255, (C_ * B_, F_ * IM[0] * IM[1] * 3),
                         dtype=np.uint8)
    idx = rng.permutation(C_ * B_).reshape(C_, B_).astype(np.int32)
    syn = rng.normal(size=(C_, F_, IM[0], IM[1], 3)).astype(np.float32)
    stats = np.full((3,), 127.5, np.float32)

    def run(place_idx, place_clips):
        s, m, loss = step(jax.random.PRNGKey(0), jnp.asarray(syn),
                          jnp.zeros_like(jnp.asarray(syn)),
                          place_clips(clips), place_idx(idx),
                          jnp.asarray(stats), jnp.asarray(stats))
        return np.asarray(s), float(loss)

    s_rep, loss_rep = run(jnp.asarray, jnp.asarray)
    s_sh, loss_sh = run(shard_divisible, replicate_array)
    np.testing.assert_allclose(loss_sh, loss_rep, rtol=1e-5)
    np.testing.assert_allclose(s_sh, s_rep, rtol=1e-4, atol=1e-5)


def test_sharded_store_dm_400_classes():
    """K400-scale path: a 400-class store row-sharded over the mesh (no
    full copy per device) must train DM with numerics equal to the
    replicated placement."""
    import jax.numpy as jnp
    from video_distillation_tpu.data.meta import DatasetMeta, register_meta
    from video_distillation_tpu.data.store import ClipStore
    from video_distillation_tpu.distill.dm import DMState, make_dm_trainer

    C_, B_ = 400, 2
    meta = DatasetMeta(name="shard-k400", channel=3, im_size=(16, 16),
                       num_classes=C_, mean=(0.5, 0.5, 0.5),
                       std=(0.5, 0.5, 0.5), frames=1)
    register_meta(meta)
    rng = np.random.default_rng(0)
    clips = rng.integers(0, 255, (C_ * 3, 16, 16, 3), dtype=np.uint8)
    labels = np.repeat(np.arange(C_), 3).astype(np.int32)
    store = ClipStore(clips, labels, meta)

    sharded = store.device_clips(sharded=True)
    assert not sharded.sharding.is_fully_replicated
    # each device holds 1/8 of the (padded) rows
    assert sharded.shape[0] % 8 == 0

    def run(shard):
        trainer = make_dm_trainer(store, "ConvNet", ipc=1, batch_real=B_,
                                  lr_img=1.0, frames=1,
                                  shard_store=shard)
        syn = jnp.asarray(
            np.random.default_rng(3).standard_normal((C_, 16, 16, 3)),
            jnp.float32)
        state = DMState(syn, jnp.arange(C_, dtype=jnp.int32),
                        jnp.zeros_like(syn))
        state, loss = trainer(jax.random.PRNGKey(0), state,
                              np.random.default_rng(7))
        return float(loss)

    loss_sh = run(True)
    loss_rep = run(False)
    np.testing.assert_allclose(loss_sh, loss_rep, rtol=1e-4)


def test_sharded_buffer_epoch_runs():
    """One expert-buffer training epoch over the mesh (plan sharded over
    the padded batch axis)."""
    from video_distillation_tpu.config import BufferConfig
    from video_distillation_tpu.data import make_synthetic_video_data
    from video_distillation_tpu.distill.buffer import train_expert

    data = make_synthetic_video_data(num_classes=3, clips_per_class=7,
                                     test_per_class=2, frames=8,
                                     im_size=(64, 64), seed=0,
                                     name="shard-buf")
    cfg = BufferConfig(dataset="shard-buf", num_experts=1, train_epochs=2,
                       batch_train=12,  # 12 % 8 != 0 -> padded to 16
                       frames=8, compute_dtype="float32")
    traj, acc = train_expert(jax.random.PRNGKey(0), data.train, cfg,
                             np.random.default_rng(0))
    assert traj.shape[0] == 3  # init + 2 epochs
    assert np.isfinite(traj).all()
    assert 0.0 <= acc <= 1.0


def test_distributed_helpers_single_host():
    """init_distributed is a silent no-op without cluster config; the
    coordinator predicate holds on process 0 (multi-host writes gate on
    it — utils/checkpoint.py)."""
    from video_distillation_tpu.parallel import (init_distributed,
                                                 is_coordinator,
                                                 process_index)

    assert init_distributed() is False
    assert process_index() == 0
    assert is_coordinator() is True


def test_sharded_eval_train_scan_matches_single_device():
    """The eval training scan shards its batch axis over the mesh
    (evaluate.py _build_train_fn); with a mesh-divisible batch the
    numerics equal the 1-device run exactly (same RNG, same graph —
    only the sharding constraint differs)."""
    import jax.numpy as jnp

    from video_distillation_tpu.distill.evaluate import (EvalConfig,
                                                         _build_train_fn)
    from video_distillation_tpu.parallel import make_mesh

    num_classes, frames, im, n_syn = 4, 8, (64, 64), 8
    cfg = EvalConfig(model="ConvNet3D", epoch_eval_train=3, lr_net=0.01,
                     batch_train=8)
    syn = jax.random.normal(jax.random.PRNGKey(0),
                            (n_syn, frames) + im + (3,))
    labels = np.repeat(np.arange(num_classes), n_syn // num_classes)
    key = jax.random.PRNGKey(1)
    outs = {}
    for n_dev in (1, 8):
        train_fn, _ = _build_train_fn("ConvNet3D", 3, num_classes, im,
                                      frames, n_syn, cfg, None,
                                      mesh=make_mesh(n_dev))
        params, acc_train, loss = train_fn(
            key, syn, np.asarray(labels, np.int32),
            jnp.asarray(cfg.lr_net, jnp.float32))
        outs[n_dev] = (np.asarray(loss), float(acc_train))
    np.testing.assert_allclose(outs[1][0], outs[8][0], rtol=2e-5)
    assert outs[1][1] == outs[8][1]
