"""Distribution-Matching distillation, batched over classes.

Parity with the reference DM branch (``/root/reference/distill_baseline.py:
292-361`` and the S2D DM branch ``distill_s2d_ms.py:312-445``):
each iteration draws a fresh random frozen net, embeds ``batch_real`` real
clips and the synthetic clips per class, and descends
``sum_c ||mean(embed(real_c)) - mean(embed(syn_c))||^2`` into the synthetic
parameters with SGD(momentum 0.5) — or, for S2D, into
(static, dynamic, hallucinators) with SGD(momentum 0.95) each at its own LR
(distill_s2d_ms.py:105-107).

TPU-first: the per-class python loop becomes ONE batched embed of the
``(C*B, F, H, W, 3)`` real gather plus one of the synthetic set, with
segment means — the whole outer step is a single jit. Real clips are
gathered in-graph from the HBM-resident uint8 clip store; the per-class
index plan is drawn host-side with numpy to keep the reference's
without-replacement semantics (distill_baseline.py:84-90).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.store import ClipStore
from ..models.registry import create_model
from ..parallel import replicate_array, shard_divisible
from ..utils.xla_opts import tpu_compiler_options
from .s2d import S2DConfig, distill_slots, hallucinate


def init_synthetic_raw(key, store: ClipStore, ipc: int, frames: int,
                       init: str = "real",
                       rng: Optional[np.random.Generator] = None):
    """(C*ipc, F, H, W, 3) float32 synthetic tensor in normalised space +
    labels [0,0,...,1,1,...] (distill_baseline.py:92-101)."""
    meta = store.meta
    C = meta.num_classes
    shape = (C * ipc, frames, meta.im_size[0], meta.im_size[1], meta.channel)
    labels = np.repeat(np.arange(C), ipc).astype(np.int32)
    if init == "real":
        rng = rng or np.random.default_rng(0)
        idx = store.sample_per_class(rng, ipc).reshape(-1)
        imgs = jnp.asarray(store.clips[idx])
        syn = store.normalize(imgs).astype(jnp.float32)
        syn = syn.reshape(shape)
    else:
        syn = jax.random.normal(key, shape, jnp.float32)
    return syn, jnp.asarray(labels)


def _standardize(r_u8, norm_mean, norm_std, cdt):
    """uint8 clips -> standardized compute-dtype clips.

    Under bf16 compute the whole chain runs in bf16: u8 values 0-255 are
    exactly representable (8 mantissa bits) and the model input is cast
    to bf16 immediately afterwards anyway, so the only numerical delta
    vs the fp32 chain is one extra rounding in the subtract — while the
    fp32 intermediates cost ~90 ms/step of convert/copy bandwidth on the
    640-clip DM real-embed chunks (profile_step.py --graph dm, r5).
    """
    if cdt == jnp.bfloat16:
        inv = (1.0 / norm_std).astype(cdt)
        return (r_u8.astype(cdt) - norm_mean.astype(cdt)) * inv
    return ((r_u8.astype(jnp.float32) - norm_mean) / norm_std).astype(cdt)


@functools.lru_cache(maxsize=16)
def _build_dm_step(model_name: str, channel: int, num_classes: int,
                   im_size: Tuple[int, int], frames: int, ipc: int,
                   batch_real: int, lr_img: float, compute_dtype: str):
    model_def = create_model(model_name, channel, num_classes, im_size,
                             frames)
    from ..models.registry import is_video_model
    item_shape = ((frames,) + im_size + (channel,)
                  if is_video_model(model_name)
                  else im_size + (channel,))
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    def step(key, syn_images, mom, clips_u8, real_idx, norm_mean, norm_std):
        """One DM outer iteration.

        clips_u8: flat (N, prod(item)) uint8 store; real_idx: (C, B)
        host-drawn per-class indices; norm_mean/std: channel stats * 255.
        """
        k_init = jax.random.fold_in(key, 0)
        sample = syn_images[:1]
        params = model_def.init({"params": k_init, "dropout": k_init},
                                sample, train=False)["params"]
        # bf16 conv compute requires bf16 params too, else XLA promotes
        params = jax.tree.map(lambda a: a.astype(cdt), params)

        # chunk the (C * batch_real) real embed over class groups: one
        # monolithic forward materialises an (C*B, F, H, W, 9) conv1
        # im2col intermediate (11.5 GB at the miniUCF101 DM config,
        # OOM); a scan of ~640-clip chunks bounds it while each chunk
        # still fills the chip (and shards over the mesh identically).
        # batchnorm models must embed monolithically — per-chunk batch
        # statistics would silently change the DM feature means
        if getattr(model_def, "net_norm", "none") == "batchnorm":
            cpc = num_classes
        else:
            cpc = 1
            for d in range(num_classes, 0, -1):
                if num_classes % d == 0 and d * batch_real <= 640:
                    cpc = d
                    break
        idx_chunks = real_idx.reshape(num_classes // cpc,
                                      cpc * batch_real)

        def embed_chunk(_, idx_row):
            r = clips_u8[idx_row].reshape((-1,) + item_shape)
            r = _standardize(r, norm_mean, norm_std, cdt)
            f = model_def.apply({"params": params}, r,
                                train=True, output="feat")
            return None, f.astype(jnp.float32)

        _, feats = jax.lax.scan(embed_chunk, None, idx_chunks)
        feat_real = feats.reshape(num_classes, batch_real, -1)
        mean_real = jax.lax.stop_gradient(feat_real.mean(axis=1))

        def loss_fn(syn):
            feat_syn = model_def.apply({"params": params}, syn.astype(cdt),
                                       train=True, output="feat")
            feat_syn = feat_syn.astype(jnp.float32)
            feat_syn = feat_syn.reshape(num_classes, ipc, -1)
            return jnp.sum((mean_real - feat_syn.mean(axis=1)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(syn_images)
        mom = 0.5 * mom + grads
        syn_images = syn_images - lr_img * mom
        return syn_images, mom, loss

    return jax.jit(step, donate_argnums=(1, 2),
                   compiler_options=tpu_compiler_options())


@dataclasses.dataclass
class DMState:
    syn_images: jax.Array
    labels: jax.Array
    momentum: jax.Array


def make_dm_trainer(store: ClipStore, model_name: str, ipc: int,
                    batch_real: int, lr_img: float, frames: int,
                    compute_dtype: str = "float32",
                    shard_store: bool = False):
    """Returns step(key, state, np_rng) -> (state, loss).

    ``shard_store=True`` keeps the uint8 clip tensor row-sharded over the
    mesh (1/n_dev per device) instead of replicated — required for
    K400/SSv2-scale stores that exceed single-chip HBM.
    """
    meta = store.meta
    step_fn = _build_dm_step(model_name, meta.channel, meta.num_classes,
                             tuple(meta.im_size), frames, ipc, batch_real,
                             lr_img, compute_dtype)
    # clips replicated (or row-sharded) over the mesh; the (C, B) real
    # index sharded over whichever axis divides it — XLA partitions the
    # batched embed and psums the synthetic gradient over ICI
    clips_dev = (store.device_clips(sharded=True) if shard_store
                 else replicate_array(store.device_clips()))
    norm_mean = jnp.asarray(meta.mean, jnp.float32) * 255.0
    norm_std = jnp.asarray(meta.std, jnp.float32) * 255.0

    def step(key, state: DMState, np_rng: np.random.Generator):
        idx = shard_divisible(store.sample_per_class(np_rng, batch_real))
        syn, mom, loss = step_fn(key, state.syn_images, state.momentum,
                                 clips_dev, idx, norm_mean, norm_std)
        # loss stays on device — fetching per-iteration costs a full relay
        # round trip; drivers convert only at log points
        return DMState(syn, state.labels, mom), loss

    return step


# ---------------------------------------------------------------------------
# S2D DM
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _build_s2d_dm_step(model_name: str, channel: int, num_classes: int,
                       im_size: Tuple[int, int], frames: int,
                       s2d_items: tuple, batch_real: int, lr_static: float,
                       lr_dynamic: float, lr_hal: float,
                       train_static: bool, compute_dtype: str):
    model_def = create_model(model_name, channel, num_classes, im_size,
                             frames)
    s2d_cfg = S2DConfig(**dict(s2d_items))
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    vpc = s2d_cfg.vpc

    def step(key, s2d_state, moms, clips_u8, real_idx, norm_mean, norm_std):
        k_init, k_slots = jax.random.split(jax.random.fold_in(key, 0))
        sample = jnp.zeros((1, frames, im_size[0], im_size[1], channel))
        params = model_def.init({"params": k_init, "dropout": k_init},
                                sample, train=False)["params"]
        params = jax.tree.map(lambda a: a.astype(cdt), params)

        real = clips_u8[real_idx.reshape(-1)].reshape(
            (-1, frames) + im_size + (channel,))
        real = _standardize(real, norm_mean, norm_std, cdt)
        feat_real = model_def.apply({"params": params}, real,
                                    train=True, output="feat")
        feat_real = feat_real.astype(jnp.float32).reshape(
            num_classes, batch_real, -1)
        mean_real = jax.lax.stop_gradient(feat_real.mean(axis=1))

        # DM slot draw over the whole synthetic set
        # (distill_s2d_ms.py:402-407)
        n = num_classes * vpc
        label, s_idx, d_idx = distill_slots(k_slots, num_classes,
                                            s2d_cfg.spc, vpc, n,
                                            jnp.arange(n))

        def loss_fn(state):
            st = state["static"]
            static = st.reshape(st.shape[0], -1)[s_idx].reshape(
                (-1,) + st.shape[1:])
            dy = state["dynamic"]
            flat_idx = label * dy.shape[1] + d_idx
            dynamic = dy.reshape(dy.shape[0] * dy.shape[1], -1)[
                flat_idx].reshape((-1,) + dy.shape[2:])
            syn = hallucinate(state["hals"][0], static, dynamic,
                              s2d_cfg.hal_mode)
            feat_syn = model_def.apply({"params": params}, syn.astype(cdt),
                                       train=True, output="feat")
            feat_syn = feat_syn.astype(jnp.float32).reshape(
                num_classes, vpc, -1)
            return jnp.sum((mean_real - feat_syn.mean(axis=1)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(s2d_state)

        new_state, new_moms = {}, {}
        for name, lr, mu, train in (("static", lr_static, 0.95,
                                     train_static),
                                    ("dynamic", lr_dynamic, 0.95, True),
                                    ("hals", lr_hal, 0.95, True)):
            if not train:
                new_state[name] = s2d_state[name]
                new_moms[name] = moms[name]
                continue
            m = jax.tree.map(lambda mm, g: 0.95 * mm + g, moms[name],
                             grads[name])
            new_state[name] = jax.tree.map(lambda p, mm: p - lr * mm,
                                           s2d_state[name], m)
            new_moms[name] = m
        return new_state, new_moms, loss

    return jax.jit(step, donate_argnums=(1, 2),
                   compiler_options=tpu_compiler_options())


def make_s2d_dm_trainer(store: ClipStore, model_name: str,
                        s2d_cfg: S2DConfig, batch_real: int,
                        lr_static: float, lr_dynamic: float, lr_hal: float,
                        train_static: bool, frames: int,
                        compute_dtype: str = "float32",
                        shard_store: bool = False):
    meta = store.meta
    s2d_items = tuple(sorted(dataclasses.asdict(s2d_cfg).items()))
    step_fn = _build_s2d_dm_step(model_name, meta.channel, meta.num_classes,
                                 tuple(meta.im_size), frames, s2d_items,
                                 batch_real, lr_static, lr_dynamic, lr_hal,
                                 train_static, compute_dtype)
    clips_dev = (store.device_clips(sharded=True) if shard_store
                 else replicate_array(store.device_clips()))
    norm_mean = jnp.asarray(meta.mean, jnp.float32) * 255.0
    norm_std = jnp.asarray(meta.std, jnp.float32) * 255.0

    def step(key, s2d_state, moms, np_rng: np.random.Generator):
        idx = shard_divisible(store.sample_per_class(np_rng, batch_real))
        return step_fn(key, s2d_state, moms, clips_dev, idx, norm_mean,
                       norm_std)

    return step


def init_s2d_momentum(s2d_state):
    return jax.tree.map(jnp.zeros_like, s2d_state)
