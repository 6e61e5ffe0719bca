"""Device mesh + sharding helpers.

The reference's only parallelism is single-process data parallelism:
``nn.DataParallel`` over the MTT student forward
(``/root/reference/distill_baseline.py:196-197, :243-244``) and
``jax.pmap``/``lax.pmean`` in FRePo (``frepo.py:235-241``). The TPU-native
replacement (SURVEY.md §2.3) is ONE ``jax.jit`` over a
``jax.sharding.Mesh`` with NamedSharding annotations: batches are sharded
over the ``data`` axis, parameters/synthetic pytrees replicated, and XLA
inserts the psum/all-gather collectives over ICI. Multi-host runs extend
the same mesh over DCN via ``jax.distributed.initialize`` — no NCCL
process-group plumbing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def get_mesh() -> Mesh:
    global _MESH
    if _MESH is None:
        _MESH = make_mesh()
    return _MESH


def set_mesh(mesh: Mesh):
    global _MESH
    _MESH = mesh


def data_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x):
    """Place a host array sharded over the data axis (pads nothing — the
    caller guarantees divisibility)."""
    return jax.device_put(x, data_sharding(mesh))
