"""FRePo — neural-feature kernel-ridge-regression distillation with an
online model pool.

Parity sources:
* ``nfr`` KRR prediction ``K_tp (K_pp + reg·tr/n·I)^-1 y`` —
  ``/root/reference/FRePo/lib/datadistillation/frepo.py:106-112`` and the
  torch port ``FRePo/script/distill_s2d.py:124-137``
* label handling: centered one-hot ``y - 1/C``; synthetic labels scaled by
  ``1/sqrt(C/10)`` (``distill_s2d.py:253-263``)
* label-margin regulariser ``lb_margin_th`` (``frepo.py:152-157``)
* online model pool of ``num_nn_state`` nets trained one step per outer
  iteration on the current synthetic set (MSE, Adam(lr_net) with linear
  warmup 500 + cosine), reset after ``max_online_updates``
  (``distill_s2d.py:90-178, :283-294``)
* S2D composition of ALL prototypes per step with per-prototype random
  hallucinator choice (``distill_s2d.py:60-87``)
* synthetic optimiser: Adam with separate lr_d (dynamic) / lr_h (rest)
  groups + cosine annealing to 0.1x over the run (``distill_s2d.py:268-272``)

TPU-first: the KRR solve runs in fp32 via ``jax.scipy.linalg.solve``
(assume_a='pos') — a tiny MXU-friendly dense solve; everything else is
bf16-able batched convs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import jax.scipy as jsp
import numpy as np
import optax

from ..data.store import ClipStore
from ..models.registry import create_model
from ..ops.losses import lb_margin_th
from .s2d import S2DConfig, hallucinate


def frepo_labels(labels: np.ndarray, num_classes: int,
                 scale: Optional[float] = None) -> np.ndarray:
    """Centered one-hot (y - 1/C), optionally scaled (synthetic labels are
    divided by sqrt(C/10)) — distill_s2d.py:253-263."""
    y = np.eye(num_classes, dtype=np.float32)[labels] - 1.0 / num_classes
    if scale:
        y = y / scale
    return y


def nfr(feat_target, feat_proto, y_proto, reg: float = 1e-6):
    """KRR prediction in fp32 (frepo.py:106-112)."""
    feat_proto = feat_proto.astype(jnp.float32)
    feat_target = feat_target.astype(jnp.float32)
    k_pp = feat_proto @ feat_proto.T
    k_tp = feat_target @ feat_proto.T
    n = k_pp.shape[0]
    k_pp_reg = k_pp + jnp.abs(reg) * jnp.trace(k_pp) * jnp.eye(n) / n
    pred = k_tp @ jsp.linalg.solve(k_pp_reg, y_proto, assume_a="pos")
    return pred


@dataclasses.dataclass
class FRePoConfig:
    num_classes: int
    ppc: int = 1                   # prototypes per class (spc)
    dpc: int = 1
    frames: int = 16
    im_size: Tuple[int, int] = (112, 112)
    n_hal: int = 1
    hal_mode: str = "concat"
    # lr_d default matches the reference driver's tuned value
    # (FRePo/script/distill_s2d.py:420 argparse default, scaled); 1e3 was
    # measured to collapse the KRR prediction (commit a1c98d8)
    lr_d: float = 1e2
    lr_h: float = 1e-3
    lr_net: float = 3e-4
    num_nn_state: int = 10
    max_online_updates: int = 100
    Iteration: int = 10000
    batch_real: int = 512
    learn_label: bool = False
    reg: float = 1e-6
    s2d: bool = True


def _pool_schedule(lr_net: float, max_online_updates: int):
    """LinearLR(0.01 -> 1, 500 iters) chained with cosine to 1% (torch
    ChainedScheduler multiplies the factors — distill_s2d.py:285-287)."""
    def sched(t):
        warm = jnp.minimum(1.0, 0.01 + (1.0 - 0.01) * t / 500.0)
        cos = 0.01 + 0.5 * (1 - 0.01) * (1 + jnp.cos(
            jnp.pi * jnp.minimum(t, max_online_updates)
            / max_online_updates))
        return lr_net * warm * cos
    return sched


class ModelPool:
    """Online net pool (distill_s2d.py:90-178): each element holds
    (params, adam state, step); staggered initial steps; reset after
    max_online_updates."""

    def __init__(self, key, model_def, cfg: FRePoConfig, sample_shape):
        self.model_def = model_def
        self.cfg = cfg
        self.tx = optax.adam(_pool_schedule(cfg.lr_net,
                                            cfg.max_online_updates))
        self.sample = jnp.zeros(sample_shape)
        self.elements = []
        for idx in range(cfg.num_nn_state):
            k = jax.random.fold_in(key, idx)
            params = self._init_params(k)
            init_step = (cfg.max_online_updates // cfg.num_nn_state) * idx
            self.elements.append({
                "params": params,
                "opt": self.tx.init(params),
                "step": init_step,
                "key": k,
            })

    def _init_params(self, k):
        return self.model_def.init({"params": k, "dropout": k}, self.sample,
                                   train=False)["params"]

    def state_dict(self):
        """Checkpointable pytree of the whole pool (the reference never
        checkpoints its pool — resume there restarts it; here resume is
        exact)."""
        return [{"params": el["params"], "opt": el["opt"],
                 "step": np.asarray(el["step"]), "key": el["key"]}
                for el in self.elements]

    def load_state_dict(self, sd):
        assert len(sd) == len(self.elements)
        for el, s in zip(self.elements, sd):
            el["params"] = jax.tree.map(jnp.asarray, s["params"])
            el["opt"] = jax.tree.map(jnp.asarray, s["opt"])
            el["step"] = int(s["step"])
            el["key"] = jnp.asarray(s["key"])

    def sample_idx(self, np_rng: np.random.Generator) -> int:
        return int(np_rng.integers(0, self.cfg.num_nn_state))

    def train_step(self, idx: int, x_syn, y_syn, np_rng, train_step_fn):
        el = self.elements[idx]
        n = x_syn.shape[0]
        bs = min(500, n)
        sel = (np.arange(n) if n <= bs
               else np_rng.choice(n, size=bs, replace=False))
        drop_key = jax.random.fold_in(el["key"], el["step"])
        el["params"], el["opt"] = train_step_fn(
            el["params"], el["opt"], x_syn[jnp.asarray(sel)],
            y_syn[jnp.asarray(sel)], drop_key)
        el["step"] += 1
        if el["step"] >= self.cfg.max_online_updates:
            el["key"] = jax.random.fold_in(el["key"], 7)
            el["params"] = self._init_params(el["key"])
            el["opt"] = self.tx.init(el["params"])
            el["step"] = 0


def krr_evaluate(model_def, params, x_syn, y_syn, test_clips_u8,
                 test_labels, mean, std, reg: float = 1e-6,
                 batch: int = 256):
    """KRR evaluation (frepo.py:205-227 ``proto_eval_step`` +
    ``compute_feat_kpp``): features of the synthetic set form the kernel;
    test predictions are ridge-regression reads. Returns top-1 accuracy."""
    mean_a = jnp.asarray(mean, jnp.float32) * 255.0
    std_a = jnp.asarray(std, jnp.float32) * 255.0

    @jax.jit
    def feat_of(x_u8):
        x = (x_u8.astype(jnp.float32) - mean_a) / std_a
        return model_def.apply({"params": params}, x, train=False,
                               output="feat")

    @jax.jit
    def syn_feat(x_syn):
        return model_def.apply({"params": params}, x_syn, train=False,
                               output="feat")

    feat_syn = syn_feat(x_syn).astype(jnp.float32)
    k_pp = feat_syn @ feat_syn.T
    n = k_pp.shape[0]
    k_pp_reg = k_pp + jnp.abs(reg) * jnp.trace(k_pp) * jnp.eye(n) / n
    sol = jsp.linalg.solve(k_pp_reg, y_syn, assume_a="pos")

    correct, total = 0, 0
    for i in range(0, test_clips_u8.shape[0], batch):
        xb = jnp.asarray(test_clips_u8[i:i + batch])
        yb = test_labels[i:i + batch]
        ft = feat_of(xb).astype(jnp.float32)
        pred = ft @ feat_syn.T @ sol
        correct += int((np.asarray(jnp.argmax(pred, -1)) == yb).sum())
        total += len(yb)
    return correct / max(1, total)


def make_frepo_trainer(store: ClipStore, model_name: str, cfg: FRePoConfig,
                       key, path_static: Optional[np.ndarray] = None,
                       shard_store: bool = False):
    """Builds the full FRePo S2D training closure.

    Returns (state, step_fn) where step_fn(key, state, np_rng) runs one
    outer iteration (proto update + one pool-element online step) and
    returns (state, metrics).

    Data-parallel over the mesh: the real batch index plan is -1-padded
    and sharded over the data axis (the masked MSE mean makes XLA psum
    the proto gradients over ICI — the NamedSharding equivalent of the
    reference's ``lax.pmean`` pmap, frepo.py:186-188,235-241); the pool's
    online batch is likewise sharded when divisible.
    """
    meta = store.meta
    model_def = create_model(model_name, meta.channel, cfg.num_classes,
                             tuple(meta.im_size), cfg.frames)
    from ..models.registry import is_video_model
    if is_video_model(model_name):
        sample_shape = (1, cfg.frames, meta.im_size[0], meta.im_size[1],
                        meta.channel)
    else:
        sample_shape = (1, meta.im_size[0], meta.im_size[1], meta.channel)

    k_syn, k_pool = jax.random.split(key)
    # synthetic state
    h, w = meta.im_size
    s2d_cfg = S2DConfig(num_classes=cfg.num_classes, spc=cfg.ppc,
                        dpc=cfg.dpc, vpc=cfg.ppc, n_hal=cfg.n_hal,
                        frames=cfg.frames, im_size=(h, w),
                        hal_mode=cfg.hal_mode)
    from .s2d import init_s2d_state
    ks, kd = jax.random.split(k_syn)
    y_scale = float(np.sqrt(cfg.num_classes / 10.0))
    y_syn = frepo_labels(np.repeat(np.arange(cfg.num_classes), cfg.ppc),
                         cfg.num_classes, scale=y_scale)
    if cfg.s2d:
        base = init_s2d_state(ks, s2d_cfg)
        if path_static is not None:
            base["static"] = jnp.asarray(path_static)
        state = {"dynamic": base["dynamic"], "hals": base["hals"],
                 "y_syn": jnp.asarray(y_syn)}
        static_frozen = base["static"]
    else:
        # raw ProtoHolder (frepo.py:129-143): learnable x_proto initialised
        # from random real samples per class
        rng0 = np.random.default_rng(0)
        idx = store.sample_per_class(rng0, cfg.ppc).reshape(-1)
        import jax.numpy as _jnp
        x0 = store.normalize(_jnp.asarray(store.clips[idx]))
        state = {"x_proto": x0.astype(jnp.float32),
                 "y_syn": jnp.asarray(y_syn)}
        static_frozen = None

    # Adam param groups: lr_d for dynamic, lr_h for the rest. torch
    # CosineAnnealingLR(synopt, eta_min=lr_h*0.1) anneals EVERY group to the
    # same absolute floor 0.1*lr_h (distill_s2d.py:272) — so the dynamic
    # group (lr_d ~ 1e3) ends at ~1e-4, not 0.1*lr_d
    def cosine(lr):
        eta_min = 0.1 * cfg.lr_h

        def sched(t):
            frac = jnp.minimum(t, cfg.Iteration) / cfg.Iteration
            return eta_min + (lr - eta_min) * 0.5 * (
                1 + jnp.cos(jnp.pi * frac))
        return sched

    labels_map = ({"dynamic": "d", "hals": "h", "y_syn": "h"} if cfg.s2d
                  else {"x_proto": "d", "y_syn": "h"})
    tx = optax.multi_transform(
        {"d": optax.adam(cosine(cfg.lr_d)), "h": optax.adam(cosine(cfg.lr_h))},
        labels_map)
    opt_state = tx.init(state)

    from ..parallel import (data_sharding, get_mesh, pad_and_shard_plan,
                            replicate_array)

    norm_mean = jnp.asarray(meta.mean, jnp.float32) * 255.0
    norm_std = jnp.asarray(meta.std, jnp.float32) * 255.0
    clips_dev = (store.device_clips(sharded=True) if shard_store
                 else replicate_array(store.device_clips()))
    y_train = replicate_array(frepo_labels(store.labels, cfg.num_classes))

    def compose(state, hal_choice):
        """All prototypes: static_idx=i, dynamic_idx=i%dpc
        (distill_s2d.py:69-81); raw mode returns x_proto directly."""
        if not cfg.s2d:
            return state["x_proto"]
        n = cfg.num_classes * cfg.dpc
        i = jnp.arange(n)
        static = static_frozen[i]
        dynamic = state["dynamic"][i // cfg.dpc, i % cfg.dpc]
        if cfg.n_hal == 1:
            return hallucinate(state["hals"][0], static, dynamic,
                               cfg.hal_mode)
        outs = jnp.stack([hallucinate(p, static, dynamic, cfg.hal_mode)
                          for p in state["hals"]])
        return outs[hal_choice, i]

    @jax.jit
    def proto_step(key, state, opt_state, pool_params, real_idx):
        # real_idx is a -1-padded, mesh-sharded plan; padded rows carry
        # weight 0 so the masked mean equals the unpadded batch mean
        kh = jax.random.split(key, 1)[0]
        hal_choice = jax.random.randint(
            kh, (cfg.num_classes * cfg.dpc,), 0, max(1, cfg.n_hal))
        w = (real_idx >= 0).astype(jnp.float32)
        safe = jnp.maximum(real_idx, 0)
        real = clips_dev[safe].reshape(
            (-1,) + tuple(store.item_shape))
        x_tar = (real.astype(jnp.float32) - norm_mean) / norm_std
        feat_tar = model_def.apply({"params": pool_params}, x_tar,
                                   train=False, output="feat")
        feat_tar = jax.lax.stop_gradient(feat_tar)
        y_tar = y_train[safe]

        def loss_fn(st):
            x_syn = compose(st, hal_choice)
            feat_syn = model_def.apply({"params": pool_params}, x_syn,
                                       train=False, output="feat")
            y_s = st["y_syn"] if cfg.learn_label else \
                jax.lax.stop_gradient(st["y_syn"])
            pred = nfr(feat_tar, feat_syn, y_s, cfg.reg)
            sq = jnp.sum((pred - y_tar) ** 2, axis=-1)
            ln = jnp.sum(sq * w) / jnp.maximum(jnp.sum(w), 1.0)
            lb = lb_margin_th(y_s).mean()
            return ln + lb, (ln, lb)

        (loss, (ln, lb)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state)
        updates, opt_state = tx.update(grads, opt_state, state)
        state = optax.apply_updates(state, updates)
        return state, opt_state, loss, ln, lb

    pool = ModelPool(k_pool, model_def, cfg, sample_shape)

    @jax.jit
    def pool_train_step(params, opt, x, y, drop_key):
        # pool nets train in train mode (model.train() in the reference —
        # distill_s2d.py:153 — so dropout is active)
        def loss_fn(p):
            out = model_def.apply({"params": p}, x, train=True,
                                  rngs={"dropout": drop_key})
            return jnp.mean((out - y) ** 2)

        grads = jax.grad(loss_fn)(params)
        updates, opt = pool.tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt

    @jax.jit
    def compose_eval(key, state):
        hal_choice = jax.random.randint(
            key, (cfg.num_classes * cfg.dpc,), 0, max(1, cfg.n_hal))
        return compose(state, hal_choice)

    def step(key, carry, np_rng: np.random.Generator):
        state, opt_state = carry
        real_idx = pad_and_shard_plan(np_rng.choice(
            len(store), size=min(cfg.batch_real, len(store)),
            replace=False).astype(np.int32))
        idx = pool.sample_idx(np_rng)
        el_params = pool.elements[idx]["params"]
        state, opt_state, loss, ln, lb = proto_step(
            key, state, opt_state, el_params, real_idx)
        x_syn = compose_eval(jax.random.fold_in(key, 3), state)
        # shard the composed prototypes over their batch axis when it
        # divides the mesh (never a feature axis — that would split the
        # conv spatial/temporal dims)
        mesh = get_mesh()
        if mesh.devices.size > 1 and x_syn.shape[0] % mesh.devices.size == 0:
            x_syn = jax.device_put(x_syn, data_sharding(mesh))
        y_syn_det = jax.lax.stop_gradient(state["y_syn"])
        pool.train_step(idx, x_syn, y_syn_det, np_rng, pool_train_step)
        return (state, opt_state), {"loss": float(loss),
                                    "ln_loss": float(ln),
                                    "lb_loss": float(lb)}

    return (state, opt_state), step, pool, compose_eval
