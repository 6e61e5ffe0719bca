"""Multi-process (multi-host) integration: jax.distributed.initialize
over a local coordinator, 2 processes x 2 virtual CPU devices each.

This validates the DCN scale-out path the drivers enable via
``parallel.init_distributed`` (SURVEY.md §2.3: the TPU-native replacement
for the reference's single-process DataParallel): a global mesh spanning
processes, a psum riding the collective backend, and the
save-from-process-0 rule.

Runs in fresh subprocesses (the parent's jax is already initialised
single-process and cannot re-initialise).
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")
pid = int(sys.argv[1])
port = sys.argv[2]

import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.getcwd())
from video_distillation_tpu.parallel import (init_distributed,
                                             is_coordinator, make_mesh)

ok = init_distributed(coordinator_address=f"127.0.0.1:{port}",
                      num_processes=2, process_id=pid)
assert ok, "init_distributed returned False with explicit cluster config"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()  # 2 procs x 2 devices
assert is_coordinator() == (pid == 0)

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh()
assert mesh.devices.size == 4

# a psum over the global mesh: each process contributes its local shard
@jax.jit
def total(x):
    return jnp.sum(x)

# globally-sharded array built from per-process local data
local = jnp.arange(2, dtype=jnp.float32) + 10.0 * pid  # 2 local devices
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (4,))
out = total(garr)
# full array = process0 [0,1] + process1 [10,11] -> sum 22
assert float(out) == 22.0, float(out)
print(f"proc {pid}: OK global_sum=22.0")
"""


def _free_port() -> str:
    """Bind an ephemeral port and release it — avoids flaking on a
    hard-coded port already held by a leftover listener or a parallel
    test run."""
    import socket

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return str(s.getsockname()[1])


def test_two_process_mesh_psum(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), port],
                         env=env, cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))),
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert "OK global_sum=22.0" in out
