"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding (ICI data-parallel etc.) is validated on a fake
8-device CPU platform, replacing cluster access.

NOTE: this environment preloads a sitecustomize that imports jax and
registers a tunneled TPU backend ('axon') at interpreter startup, so env
vars set here are too late — use jax.config.update, which takes effect at
(lazy) backend initialisation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
# persistent compile cache: the 3D-conv second-order graphs are expensive
# to compile on CPU; cache across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU platform, got "
        f"{jax.devices()[0].platform}")
    assert jax.device_count() == 8
