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


def test_graft_dryrun_multichip():
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
