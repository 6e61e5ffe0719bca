"""Pre-compile the test suite's shared graphs into the persistent JAX
compilation cache, so a fresh checkout runs ``pytest -m "not slow"``
inside the budget instead of paying minutes-long cold CPU compiles of
the 3-D-conv second-order graphs.

Usage (same env the tests use)::

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        JAX_COMPILATION_CACHE_DIR=/tmp/jax_test_cache \
        python scripts/seed_cache.py

All tests deliberately share 64x64 / frames=8 shapes (CLAUDE.md); this
script triggers the same builder entry points the tests hit, in
dependency order, and prints per-graph wall time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

import jax  # noqa: E402

if not os.environ.get("_SEED_CACHE_KEEP_PLATFORM"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

IM, FR, NC = (64, 64), 8, 4


def timed(name, fn):
    t0 = time.time()
    fn()
    print(f"{name}: {time.time() - t0:.1f}s", flush=True)


def seed_model_fwd_bwd():
    from video_distillation_tpu.distill.mtt import flat_param_template

    model_def, params, flat, unravel = flat_param_template(
        "ConvNet3D", 3, NC, IM, FR)
    x = jnp.zeros((2, FR) + IM + (3,))

    def loss(p):
        return model_def.apply({"params": p}, x, train=False).sum()

    jax.jit(loss)(params).block_until_ready()
    jax.jit(jax.grad(loss))(params)["TemporalIm2ColConv_0"][
        "bias"].block_until_ready()


def seed_mtt_step():
    from video_distillation_tpu.distill.mtt import (_build_mtt_step,
                                                    flat_param_template,
                                                    make_batch_plan)

    _, _, flat, _ = flat_param_template("ConvNet3D", 3, NC, IM, FR)
    n_syn, syn_steps = NC, 2
    step = _build_mtt_step("ConvNet3D", 3, NC, IM, FR, syn_steps,
                           lr_img=100.0, lr_lr=1e-5, train_lr=True,
                           compute_dtype="float32")
    syn = jnp.zeros((n_syn, FR) + IM + (3,))
    labels = jnp.arange(n_syn, dtype=jnp.int32)
    plan = jnp.asarray(make_batch_plan(np.random.default_rng(0), n_syn,
                                       n_syn, syn_steps))
    out = step(jax.random.PRNGKey(0), syn, labels, jnp.asarray(0.01),
               jnp.zeros_like(syn), jnp.zeros(()), jnp.asarray(flat),
               jnp.asarray(flat), plan)
    jax.block_until_ready(out)


def seed_dm_step():
    from video_distillation_tpu.distill.dm import _build_dm_step

    B = 8
    step = _build_dm_step("ConvNet3D", 3, NC, IM, FR, ipc=1, batch_real=B,
                          lr_img=1.0, compute_dtype="float32")
    clips = jnp.zeros((NC * B, FR * IM[0] * IM[1] * 3), jnp.uint8)
    idx = jnp.arange(NC * B, dtype=jnp.int32).reshape(NC, B)
    syn = jnp.zeros((NC, FR) + IM + (3,))
    stats = jnp.full((3,), 127.5)
    out = step(jax.random.PRNGKey(0), syn, jnp.zeros_like(syn), clips, idx,
               stats, stats)
    jax.block_until_ready(out)


def seed_eval_train():
    from video_distillation_tpu.distill.evaluate import (EvalConfig,
                                                         _build_train_fn)

    cfg = EvalConfig(model="ConvNet3D", epoch_eval_train=3, lr_net=0.01,
                     batch_train=8)
    train_fn, _ = _build_train_fn("ConvNet3D", 3, NC, IM, FR, 8, cfg, None)
    syn = jnp.zeros((8, FR) + IM + (3,))
    labels = np.repeat(np.arange(NC), 2).astype(np.int32)
    out = train_fn(jax.random.PRNGKey(0), syn, labels,
                   jnp.asarray(cfg.lr_net, jnp.float32))
    jax.block_until_ready(out)


def seed_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(jax.device_count())


if __name__ == "__main__":
    print(f"devices: {jax.device_count()} x {jax.devices()[0].platform}",
          flush=True)
    timed("model fwd+bwd", seed_model_fwd_bwd)
    timed("mtt outer step", seed_mtt_step)
    timed("dm step", seed_dm_step)
    timed("eval train scan", seed_eval_train)
    if jax.device_count() >= 8:
        timed("graft dryrun (multichip)", seed_dryrun)
    print("cache seeded.", flush=True)
