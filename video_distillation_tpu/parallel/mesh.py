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
_DISTRIBUTED = False

DATA_AXIS = "data"


def ensure_platform_env() -> None:
    """Make the ``JAX_PLATFORMS`` env var effective for driver processes.

    The axon terminal bootstrap (a sitecustomize that registers the
    tunneled-TPU PJRT plugin at interpreter startup) pins
    ``jax.config.jax_platforms = "axon,cpu"`` — overriding the env var,
    so ``JAX_PLATFORMS=cpu python -m ...drivers...`` would still dial
    the tunnel on the first jax op (and block for minutes when it is
    down). Re-asserting the env value into the config before any
    backend use restores standard JAX semantics. No-op when the env
    var is unset or already in effect; must run before the first
    ``jax.devices()``/op of the process.
    """
    import os

    env = os.environ.get("JAX_PLATFORMS")
    if env and jax.config.jax_platforms != env:
        jax.config.update("jax_platforms", env)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Extend the mesh over DCN for multi-host runs.

    The reference is strictly single-host (SURVEY.md §2.3: single-process
    ``nn.DataParallel`` / ``jax.pmap``); the TPU-native scale-out is
    ``jax.distributed.initialize`` + the SAME NamedSharding code path —
    ``jax.devices()`` then returns the global device list, ``make_mesh``
    spans hosts, and XLA routes the data-axis collectives over ICI within
    a slice and DCN across slices. No other code changes: every step fn
    in this framework is already written against the mesh.

    Call before any other jax API. Arguments default to the standard env
    vars (``JAX_COORDINATOR_ADDRESS``/``COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``). When none are set but the
    environment carries TPU-pod markers (``TPU_WORKER_HOSTNAMES`` /
    ``MEGASCALE_COORDINATOR_ADDRESS`` / a Cloud-TPU metadata hostname list),
    ``jax.distributed.initialize()`` is called with no arguments so JAX's
    own cluster auto-detection runs — otherwise every pod process would
    silently run single-process, each believing it is the coordinator, and
    checkpoint writers would race on the same path. Returns True iff a
    multi-process runtime was initialised (single-host runs without pod
    markers are a silent no-op so every driver can call this
    unconditionally).
    """
    global _DISTRIBUTED
    import os

    if _DISTRIBUTED:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # TPU_WORKER_HOSTNAMES is set even on single-host TPUs (e.g.
        # 'localhost' under the axon tunnel) — it only marks a pod when it
        # lists >1 worker
        pod_markers = [k for k in ("MEGASCALE_COORDINATOR_ADDRESS",)
                       if os.environ.get(k)]
        # TPU_WORKER_HOSTNAMES / TPU_PROCESS_ADDRESSES are set even on
        # single-host TPUs (e.g. 'localhost' under the axon tunnel) —
        # they only mark a pod when they list >1 entry
        for k in ("TPU_WORKER_HOSTNAMES", "TPU_PROCESS_ADDRESSES"):
            if "," in os.environ.get(k, ""):
                pod_markers.append(k)
        if not pod_markers:
            # single chip / CPU test mesh: no-op single-process run
            return False
        # multi-host pod without explicit cluster config: let JAX's
        # cluster auto-detection resolve coordinator/process ids
        try:
            jax.distributed.initialize()
        except RuntimeError as e:
            # e.g. backend already initialised by an ambient sitecustomize
            # import — degrade to single-process rather than crash
            import warnings
            warnings.warn(f"jax.distributed.initialize() failed ({e}); "
                          "continuing single-process")
            return False
        _DISTRIBUTED = True
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _DISTRIBUTED = True
    return True


def process_index() -> int:
    return jax.process_index()


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/metrics (the
    pmap-aware save-from-process-0 rule the reference FRePo uses —
    ``FRePo/lib/training/utils.py:192-196``)."""
    return jax.process_index() == 0


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


def mesh_size() -> int:
    return get_mesh().devices.size


def pad_and_shard_plan(plan: np.ndarray, mesh: Optional[Mesh] = None):
    """Place a (..., batch) int32 index plan sharded over its LAST axis.

    The batch axis is padded with -1 sentinels up to a multiple of the
    device count, so the plan is ALWAYS sharded — never silently
    replicated (the -1 rows are masked out of every loss by weight 0).
    XLA then partitions the whole inner computation over the batch and
    psums parameter gradients over ICI (the TPU-native nn.DataParallel).
    """
    mesh = mesh or get_mesh()
    n = mesh.devices.size
    plan = np.asarray(plan)
    if n == 1:
        return jax.numpy.asarray(plan)
    pad = (-plan.shape[-1]) % n
    if pad:
        plan = np.concatenate(
            [plan, np.full(plan.shape[:-1] + (pad,), -1, plan.dtype)],
            axis=-1)
    spec = [None] * (plan.ndim - 1) + [DATA_AXIS]
    return jax.device_put(jax.numpy.asarray(plan),
                          NamedSharding(mesh, P(*spec)))


def shard_divisible(x, mesh: Optional[Mesh] = None):
    """device_put ``x`` sharded over the first axis whose size divides the
    mesh; replicated if none does (cannot pad without changing semantics,
    e.g. unweighted per-class means)."""
    mesh = mesh or get_mesh()
    n = mesh.devices.size
    if n == 1:
        return jax.numpy.asarray(x)
    for axis, dim in enumerate(x.shape):
        if dim % n == 0:
            spec = [None] * x.ndim
            spec[axis] = DATA_AXIS
            return jax.device_put(jax.numpy.asarray(x),
                                  NamedSharding(mesh, P(*spec)))
    return jax.device_put(jax.numpy.asarray(x), NamedSharding(mesh, P()))


def replicate_array(x, mesh: Optional[Mesh] = None):
    """Explicitly replicate a host/device array over the mesh (keeps big
    operands like clip stores out of single-device committed placements
    that would force cross-device gathers)."""
    mesh = mesh or get_mesh()
    if mesh.devices.size == 1:
        return jax.numpy.asarray(x)
    return jax.device_put(jax.numpy.asarray(x), NamedSharding(mesh, P()))
