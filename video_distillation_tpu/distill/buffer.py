"""Expert-trajectory generation ("buffer") for MTT.

Parity with ``/root/reference/buffer.py``: train ``num_experts`` fresh
teachers on the real training split with SGD(lr_teacher, momentum=mom,
weight_decay=l2) (defaults 0.01/0/0 — buffer.sh), snapshotting the full
parameter vector at init and after every epoch (buffer.py:73-89); optional
LR x0.1 at train_epochs//2+1 with optimizer (momentum) reset
(buffer.py:91-94). Batches follow the reference epoch(): shuffled loader,
per-access random hflip (dataset.py:400-403 — buffer.sh does NOT preload),
scalar batch standardisation (utils.py:770).

TPU-first: one expert epoch is a single jitted scan over HBM-gathered
uint8 batches; trajectories are stored as dense (E+1, P) float32 arrays
(np.savez) rather than pickled tensor lists.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from ..config import BufferConfig
from ..data.store import ClipStore, VideoData
from ..models.registry import create_model
from ..parallel import mesh_size, pad_and_shard_plan, replicate_array
from ..utils.xla_opts import tpu_compiler_options
from .mtt import TrajectoryBuffer


def _cdiv(a, b):
    return -(-a // b)


@functools.lru_cache(maxsize=16)
def _build_epoch_fn(model_name: str, channel: int, num_classes: int,
                    im_size: Tuple[int, int], frames: int, batch: int,
                    nb: int, mom_mu: float, l2: float, flip: bool,
                    compute_dtype: str):
    model_def = create_model(model_name, channel, num_classes, im_size,
                             frames)
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    def epoch(params, mom, clips_u8, labels, idx_plan, lr, key, norm_mean,
              norm_std):
        """idx_plan: (nb, batch) with -1 padding."""

        def loss_fn(p, x, y, w, dk):
            pc = jax.tree.map(lambda a: a.astype(cdt), p)
            logits = model_def.apply({"params": pc}, x.astype(cdt),
                                     train=True, rngs={"dropout": dk})
            logits = logits.astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
            loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)
            correct = jnp.sum((jnp.argmax(logits, -1) == y) * w)
            return loss, correct

        def step(carry, inp):
            params, mom = carry
            idx, step_i = inp
            w = (idx >= 0).astype(jnp.float32)
            safe = jnp.maximum(idx, 0)
            x = clips_u8[safe].reshape(
                (batch, frames) + im_size + (channel,))
            x = (x.astype(jnp.float32) - norm_mean) / norm_std
            if flip:
                fk = jax.random.fold_in(jax.random.fold_in(key, 1), step_i)
                do = jax.random.bernoulli(fk, 0.5, (batch,))
                x = jnp.where(do[:, None, None, None, None],
                              x[:, :, :, ::-1, :], x)
            y = labels[safe]
            # scalar batch standardisation over valid samples (utils.py:770)
            wfull = w.reshape((-1,) + (1,) * (x.ndim - 1))
            n = jnp.sum(w) * np.prod(x.shape[1:])
            mean = jnp.sum(x * wfull) / n
            var = jnp.sum(((x - mean) ** 2) * wfull) / n
            x = (x - mean) / jnp.sqrt(var + 1e-12)
            dk = jax.random.fold_in(jax.random.fold_in(key, 2), step_i)
            (loss, correct), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, x, y, w, dk)

            def upd(p, g, m):
                d = g + l2 * p
                m_new = mom_mu * m + d
                return p - lr * m_new, m_new

            flat_p, tree = jax.tree.flatten(params)
            outs = [upd(p, g, m) for p, g, m in
                    zip(flat_p, jax.tree.leaves(grads),
                        jax.tree.leaves(mom))]
            params = jax.tree.unflatten(tree, [o[0] for o in outs])
            mom = jax.tree.unflatten(tree, [o[1] for o in outs])
            return (params, mom), (loss, correct, jnp.sum(w))

        (params, mom), (losses, corrects, counts) = jax.lax.scan(
            step, (params, mom), (idx_plan, jnp.arange(nb)))
        acc = jnp.sum(corrects) / jnp.sum(counts)
        return params, mom, jnp.mean(losses), acc

    return jax.jit(epoch, donate_argnums=(0, 1),
                   compiler_options=tpu_compiler_options())


def train_expert(key, store: ClipStore, cfg: BufferConfig,
                 np_rng: np.random.Generator):
    """Train one teacher; returns (E+1, P) float32 trajectory + final train
    acc."""
    meta = store.meta
    model_def = create_model(cfg.model, meta.channel, meta.num_classes,
                             tuple(meta.im_size), cfg.frames)
    sample = jnp.zeros((1, cfg.frames, meta.im_size[0], meta.im_size[1],
                        meta.channel))
    params = model_def.init({"params": key, "dropout": key}, sample,
                            train=False)["params"]
    flat0, unravel = ravel_pytree(params)
    mom = jax.tree.map(jnp.zeros_like, params)

    n = len(store)
    batch = min(cfg.batch_train, n)
    # pad the batch so the epoch scan's batch axis shards evenly over the
    # mesh (-1 sentinels are masked out of loss/accuracy)
    batch += (-batch) % mesh_size()
    nb = _cdiv(n, batch)
    epoch_fn = _build_epoch_fn(cfg.model, meta.channel, meta.num_classes,
                               tuple(meta.im_size), cfg.frames, batch, nb,
                               cfg.mom, cfg.l2, True, cfg.compute_dtype)
    clips_dev = (store.device_clips(sharded=True) if cfg.shard_store
                 else replicate_array(store.device_clips()))
    labels_dev = replicate_array(store.labels)
    norm_mean = jnp.asarray(meta.mean, jnp.float32) * 255.0
    norm_std = jnp.asarray(meta.std, jnp.float32) * 255.0

    snapshots = [np.asarray(flat0)]
    lr = cfg.lr_teacher
    lr_schedule = {cfg.train_epochs // 2 + 1} if cfg.decay else set()
    acc = 0.0
    for e in range(cfg.train_epochs):
        perm = np_rng.permutation(n)
        pad = nb * batch - n
        if pad:
            perm = np.concatenate([perm, np.full(pad, -1, perm.dtype)])
        plan = pad_and_shard_plan(perm.reshape(nb, batch).astype(np.int32))
        ek = jax.random.fold_in(key, e + 1)
        params, mom, loss, acc = epoch_fn(params, mom, clips_dev,
                                          labels_dev, plan, lr, ek,
                                          norm_mean, norm_std)
        snapshots.append(np.asarray(ravel_pytree(params)[0]))
        if e in lr_schedule:
            lr *= 0.1
            mom = jax.tree.map(jnp.zeros_like, params)  # optimizer recreate
    return np.stack(snapshots), float(acc)


def generate_buffers(data: VideoData, cfg: BufferConfig,
                     progress=None) -> list:
    """Train all experts; writes replay_buffer_{n}.npz files every
    ``save_interval`` experts (buffer.py:98-104). Returns file paths."""
    os.makedirs(cfg.buffer_path, exist_ok=True)
    np_rng = np.random.default_rng(cfg.seed)
    base_key = jax.random.PRNGKey(cfg.seed)
    paths = []
    trajectories = []
    for it in range(cfg.num_experts):
        k = jax.random.fold_in(base_key, it)
        traj, acc = train_expert(k, data.train, cfg, np_rng)
        trajectories.append(traj)
        if progress:
            progress(it, acc)
        if len(trajectories) == cfg.save_interval:
            n = 0
            while os.path.exists(os.path.join(
                    cfg.buffer_path, f"replay_buffer_{n}.npz")):
                n += 1
            path = os.path.join(cfg.buffer_path, f"replay_buffer_{n}.npz")
            TrajectoryBuffer(np.stack(trajectories)).save(path)
            paths.append(path)
            trajectories = []
    return paths


def load_buffers(buffer_path: str) -> list:
    """Load all replay_buffer_{n}.npz files (distill_baseline.py:122-128)."""
    if not buffer_path:
        raise ValueError(
            "MTT requires expert trajectories: pass --buffer_path pointing "
            "at a directory of replay_buffer_{n}.npz files (generate them "
            "with python -m video_distillation_tpu.drivers.buffer)")
    buffers = []
    n = 0
    while os.path.exists(os.path.join(buffer_path,
                                      f"replay_buffer_{n}.npz")):
        buffers.append(TrajectoryBuffer.load(
            os.path.join(buffer_path, f"replay_buffer_{n}.npz")))
        n += 1
    if not buffers:
        raise FileNotFoundError(f"No buffers detected at {buffer_path}")
    return buffers
