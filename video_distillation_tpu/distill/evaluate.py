"""Synthetic-set evaluation — parity with ``evaluate_synset`` + ``epoch``
(``/root/reference/utils.py:848-886, :752-844``), rebuilt as jitted
``lax.scan`` training on TPU.

Protocol reproduced exactly:
* fresh randomly-initialised net per evaluation (explicit PRNGKey instead of
  the reference's wall-clock torch seed, utils.py:519)
* SGD(lr_net, momentum 0.9, weight_decay 5e-4); LR x0.1 AFTER epoch
  Epoch//2+1 with the momentum buffer reset (the reference *recreates* the
  optimizer once that epoch has trained, utils.py:848,871-874)
* per-batch standardisation ``(img - img.mean()) / img.std()`` with scalar
  batch statistics (utils.py:770, :799) — applied on top of the dataset
  ImageNet normalisation
* 'Video*' models see a 24:-24 centre crop (utils.py:768-769)
* mode 'multi-static' composes videos through the hallucinator with fresh
  slot draws every epoch (utils.py:483-488) — in-graph, not on a CPU worker
* the test pass runs the test loader 3x with fresh random temporal crops
  (utils.py:794) in batches of 64, tracking top-1/3/5 and per-class accuracy

TPU-first details: the synthetic set and all batches stay HBM-resident; the
whole training run is one compiled scan; uint8 test clips are normalised
on-device.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import os as _os

from ..data.store import VideoData
from ..models import layers as _layers
from ..models.registry import create_model, is_video_model
from ..ops.metrics import per_class_correct
from ..utils.xla_opts import tpu_compiler_options
from .s2d import S2DConfig, hallucinate


def _compose_fn(hal_mode: str):
    """hallucinate() routes 'concat' composition to the differentiable
    Pallas hal_conv primitive on TPU (with a vmap batching rule, so the
    num_eval-vmapped training scan uses it too) and the flax module
    elsewhere."""
    return lambda p, s, d: hallucinate(p, s, d, hal_mode)

TEST_BATCH = 64  # reference testloader batch size (utils.py:459)


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    model: str = "ConvNet3D"
    epoch_eval_train: int = 500
    lr_net: float = 0.01
    batch_train: int = 256
    eval_mode: str = "SS"
    test_repeats: int = 3
    # synthetic-set parameterization: 'none' (raw tensor) or 'multi-static'
    mode: str = "none"
    # FRePo evaluation protocol (FRePo/lib_torch/utils.py:561-603):
    # optimizer 'adamw' (warmup+cosine) with 'mse' loss on soft labels and
    # no batch standardisation; default is the root protocol.
    optimizer: str = "sgd_momentum"   # 'sgd_momentum' | 'adamw'
    loss: str = "ce"                  # 'ce' | 'mse'
    standardize: bool = True
    # FRePo JAX path evaluates the debiased EMA of the trained params
    # (EMA(decay=0.995) in train_on_proto, frepo.py:252-276); 0 disables
    ema_decay: float = 0.0


def _cdiv(a, b):
    return -(-a // b)


def _video_crop(x, model_name):
    if model_name.startswith("VideoConvNet"):
        return x[:, :, 24:-24, 24:-24, :]
    return x


def _batch_standardize(x, weights):
    """(x - mean)/std with scalar stats over valid samples only."""
    w = weights.reshape((-1,) + (1,) * (x.ndim - 1))
    n = jnp.sum(w) * np.prod(x.shape[1:])
    mean = jnp.sum(x * w) / n
    var = jnp.sum(((x - mean) ** 2) * w) / n
    return (x - mean) / jnp.sqrt(var + 1e-12)


def _torch_sgd(params, grads, mom, lr, momentum, weight_decay, reset):
    def upd(p, g, m):
        d = g + weight_decay * p
        m_new = jnp.where(reset, d, momentum * m + d)
        return p - lr * m_new, m_new

    flat_p, tree = jax.tree.flatten(params)
    flat_g = jax.tree.leaves(grads)
    flat_m = jax.tree.leaves(mom)
    new_p, new_m = [], []
    for p, g, m in zip(flat_p, flat_g, flat_m):
        pn, mn = upd(p, g, m)
        new_p.append(pn)
        new_m.append(mn)
    return jax.tree.unflatten(tree, new_p), jax.tree.unflatten(tree, new_m)


def _torch_adamw(params, grads, mv, lr, t, weight_decay,
                 b1=0.9, b2=0.999, eps=1e-8):
    """torch AdamW (decoupled weight decay) with bias correction."""
    m, v = mv

    def upd(p, g, mi, vi):
        mi = b1 * mi + (1 - b1) * g
        vi = b2 * vi + (1 - b2) * g * g
        mhat = mi / (1 - b1 ** t)
        vhat = vi / (1 - b2 ** t)
        p = p * (1 - lr * weight_decay)
        p = p - lr * mhat / (jnp.sqrt(vhat) + eps)
        return p, mi, vi

    flat_p, tree = jax.tree.flatten(params)
    outs = [upd(p, g, mi, vi) for p, g, mi, vi in
            zip(flat_p, jax.tree.leaves(grads), jax.tree.leaves(m),
                jax.tree.leaves(v))]
    params = jax.tree.unflatten(tree, [o[0] for o in outs])
    m = jax.tree.unflatten(tree, [o[1] for o in outs])
    v = jax.tree.unflatten(tree, [o[2] for o in outs])
    return params, (m, v)


def _eval_slot_draw(key, idx, spc, dpc, n_hal):
    """MultiStaticSharedDataset.__getitem__ slot rules (utils.py:469-488)
    applied to a batch of dataset indices."""
    k1, k2, k3 = jax.random.split(key, 3)
    n = idx.shape[0]
    if spc == 10:
        label = idx // 5
        sub = idx % 5
        static_idx = label * spc + 2 * sub + jax.random.randint(k1, (n,), 0, 2)
        dynamic_idx = 2 * sub + jax.random.randint(k2, (n,), 0, 2)
    elif spc == 2:
        label = idx
        static_idx = label * spc + jax.random.randint(k1, (n,), 0, spc)
        dynamic_idx = jax.random.randint(k2, (n,), 0, dpc)
    else:
        raise ValueError("multi-static eval requires spc in {2, 10}")
    hal_idx = jax.random.randint(k3, (n,), 0, max(1, n_hal))
    return label, static_idx, dynamic_idx, hal_idx


def _build_train_fn(model_name: str, channel: int, num_classes: int,
                    im_size: Tuple[int, int], frames: int, n_syn: int,
                    cfg: EvalConfig, s2d_key: Optional[tuple],
                    mesh=None):
    """lru_cache wrapper: the CURRENT mesh must be part of the cache key —
    caching on mesh=None would silently reuse a compiled fn whose sharding
    constraint is bound to a stale global mesh after set_mesh().

    ``cfg.lr_net`` is normalised OUT of the cache key: the returned
    ``run`` takes the base LR as a traced argument, so evaluating at the
    current learned syn_lr (distill_baseline.py:157) does NOT recompile
    per distinct value (30-400 s per eval point through the TPU relay)."""
    if mesh is None:
        from ..parallel import get_mesh
        mesh = get_mesh()
    return _build_train_fn_cached(model_name, channel, num_classes,
                                  im_size, frames, n_syn,
                                  dataclasses.replace(cfg, lr_net=0.0),
                                  s2d_key, mesh)


@functools.lru_cache(maxsize=32)
def _build_train_fn_cached(model_name: str, channel: int, num_classes: int,
                           im_size: Tuple[int, int], frames: int, n_syn: int,
                           cfg: EvalConfig, s2d_key: Optional[tuple],
                           mesh):
    """Compile the full synthetic-training run as one jitted scan.

    The per-step batch axis is -1-padded to a multiple of the mesh and
    sharded over it, so the dominant eval phase data-parallelises on a
    real multi-chip mesh (the padded columns carry weight 0; numerics
    equal the single-device run — test_sharding.py)."""
    model_def = create_model(model_name, channel, num_classes, im_size,
                             frames)
    epochs = cfg.epoch_eval_train + 1
    bt = min(cfg.batch_train, n_syn)
    nb = _cdiv(n_syn, bt)
    drop_epoch = cfg.epoch_eval_train // 2 + 1
    s2d_cfg = None
    if s2d_key is not None:
        s2d_cfg = S2DConfig(**dict(s2d_key))

    def run(key, syn_images_or_state, syn_labels, lr_base):
        k_init, k_perm, k_drop, k_slots = jax.random.split(key, 4)
        if cfg.mode == "multi-static":
            state = syn_images_or_state
            sample = jnp.zeros((1, frames, im_size[0], im_size[1], channel))
        else:
            syn_images = syn_images_or_state
            sample = syn_images[:1]
            # 2-D row gathers are ~13x faster than N-D gathers on TPU
            item_shape = syn_images.shape[1:]
            syn2d = syn_images.reshape(n_syn, -1)
        variables = model_def.init({"params": k_init, "dropout": k_init},
                                   _video_crop(sample, model_name)
                                   if is_video_model(model_name) else sample,
                                   train=False)
        params = variables["params"]
        mom = jax.tree.map(jnp.zeros_like, params)

        # per-epoch permutations, padded to nb*bt with -1 sentinels
        perm_keys = jax.random.split(k_perm, epochs)
        perms = jax.vmap(lambda k: jax.random.permutation(k, n_syn))(
            perm_keys)
        pad = nb * bt - n_syn
        if pad:
            perms = jnp.concatenate(
                [perms, jnp.full((epochs, pad), -1, perms.dtype)], axis=1)
        batch_idx = perms.reshape(epochs * nb, bt)

        steps = epochs * nb
        ndev = mesh.devices.size
        if ndev > 1:
            pad_b = (-bt) % ndev
            if pad_b:
                batch_idx = jnp.concatenate(
                    [batch_idx,
                     jnp.full((steps, pad_b), -1, batch_idx.dtype)], axis=1)
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel.mesh import DATA_AXIS
            batch_idx = jax.lax.with_sharding_constraint(
                batch_idx, NamedSharding(mesh, PartitionSpec(None,
                                                             DATA_AXIS)))
        epoch_of_step = jnp.arange(steps) // nb
        if cfg.optimizer == "adamw":
            # torch LinearLR(0.01->1 over 10% of epochs) chained with
            # CosineAnnealing(T_max=E+1, eta_min=0.01*lr), stepped per epoch
            warm_iters = max(1, int(epochs * 0.1))
            warm = jnp.minimum(1.0, 0.01 + (1.0 - 0.01) *
                               epoch_of_step / warm_iters)
            cos = 0.01 + 0.5 * (1 - 0.01) * (
                1 + jnp.cos(jnp.pi * epoch_of_step / epochs))
            lr_steps = lr_base * warm * cos
            reset_steps = jnp.zeros(steps, bool)
        else:
            # the reference trains epoch Epoch//2+1 at full lr and only
            # recreates the optimizer AFTER it (utils.py:848,871-874), so
            # the first reduced-lr epoch is drop_epoch+1
            lr_steps = jnp.where(epoch_of_step > drop_epoch,
                                 lr_base * 0.1, lr_base)
            reset_steps = (epoch_of_step == drop_epoch + 1) & \
                          (jnp.arange(steps) % nb == 0)

        # In-scan conv lowering: XLA-CPU scalar-loops the in-loop-body
        # weight-gradients of stride-2 convs (see layers._conv2d and the
        # mtt.py note); the eval training scan pays the same pathology.
        # gemm on CPU, native on TPU; VD_EVAL_CONV overrides.
        eval_conv = _os.environ.get("VD_EVAL_CONV", "auto")
        if eval_conv == "auto":
            eval_conv = ("gemm" if jax.default_backend() == "cpu"
                         else _layers.CONV_IMPL)

        def loss_fn(p, x, y, w, dropout_key):
            with _layers.conv_impl(eval_conv):
                logits = model_def.apply({"params": p}, x, train=True,
                                         rngs={"dropout": dropout_key})
            if cfg.loss == "mse":
                # soft labels y: (B, C); torch MSELoss mean over elements
                per = jnp.mean((logits - y) ** 2, axis=-1)
                loss = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
                correct = jnp.sum(
                    (jnp.argmax(logits, -1) == jnp.argmax(y, -1)) * w)
            else:
                logp = jax.nn.log_softmax(logits, axis=-1)
                ce = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
                loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)
                correct = jnp.sum((jnp.argmax(logits, -1) == y) * w)
            return loss, correct

        def step(carry, inp):
            params, mom, ema = carry
            idx, lr, reset, step_i = inp
            w = (idx >= 0).astype(jnp.float32)
            safe = jnp.maximum(idx, 0)
            if cfg.mode == "multi-static":
                slot_key = jax.random.fold_in(k_slots, step_i)
                label, s_idx, d_idx, h_idx = _eval_slot_draw(
                    slot_key, safe, s2d_cfg.spc, s2d_cfg.dpc, s2d_cfg.n_hal)
                st = state["static"]
                static = st.reshape(st.shape[0], -1)[s_idx].reshape(
                    (-1,) + st.shape[1:])
                dy = state["dynamic"]
                flat_di = label * dy.shape[1] + d_idx
                dynamic = dy.reshape(dy.shape[0] * dy.shape[1], -1)[
                    flat_di].reshape((-1,) + dy.shape[2:])
                compose = _compose_fn(s2d_cfg.hal_mode)
                if s2d_cfg.n_hal == 1:
                    x = compose(state["hals"][0], static, dynamic)
                else:
                    outs = jnp.stack([
                        compose(hp, static, dynamic)
                        for hp in state["hals"]])
                    x = outs[h_idx, jnp.arange(static.shape[0])]
                y = label
            else:
                x = syn2d[safe].reshape((safe.shape[0],) + item_shape)
                y = syn_labels[safe]
            x = _video_crop(x, model_name)
            if cfg.standardize:
                x = _batch_standardize(x, w)
            dk = jax.random.fold_in(k_drop, step_i)
            (loss, correct), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, x, y, w, dk)
            if cfg.optimizer == "adamw":
                params, mom = _torch_adamw(params, grads, mom, lr,
                                           step_i + 1, 5e-4)
            else:
                params, mom = _torch_sgd(params, grads, mom, lr, 0.9, 5e-4,
                                         reset)
            if cfg.ema_decay > 0:
                ema = jax.tree.map(
                    lambda h, p: cfg.ema_decay * h +
                    (1 - cfg.ema_decay) * p, ema, params)
            return (params, mom, ema), (loss, correct, jnp.sum(w))

        if cfg.optimizer == "adamw":
            mom = (jax.tree.map(jnp.zeros_like, params),
                   jax.tree.map(jnp.zeros_like, params))
        ema0 = jax.tree.map(jnp.zeros_like, params) \
            if cfg.ema_decay > 0 else 0
        (params, _, ema), (losses, corrects, counts) = jax.lax.scan(
            step, (params, mom, ema0),
            (batch_idx, lr_steps, reset_steps, jnp.arange(steps)))
        if cfg.ema_decay > 0:
            # debiased average (EMA(debias=True), training/utils.py:51-169)
            bias = 1.0 - cfg.ema_decay ** steps
            params = jax.tree.map(lambda h: h / bias, ema)
        # final-epoch train accuracy (reference returns the last epoch's)
        acc_train = jnp.sum(corrects[-nb:]) / jnp.sum(counts[-nb:])
        return params, acc_train, losses[-1]

    return jax.jit(run, compiler_options=tpu_compiler_options()), model_def


@functools.lru_cache(maxsize=32)
def _build_test_fn(model_name: str, channel: int, num_classes: int,
                   im_size: Tuple[int, int], frames: int,
                   mean: tuple, std: tuple):
    model_def = create_model(model_name, channel, num_classes, im_size,
                             frames)
    mean_a = jnp.asarray(mean, jnp.float32) * 255.0
    std_a = jnp.asarray(std, jnp.float32) * 255.0

    def run(params, clips_u8, labels, weights):
        # clips_u8: (nb, B, F, H, W, C) uint8
        def batch(carry, inp):
            x_u8, y, w = inp
            x = (x_u8.astype(jnp.float32) - mean_a) / std_a
            if not is_video_model(model_name) and x.ndim == 5:
                x = x[:, 0]  # image models: drop the singleton frame axis
            x = _video_crop(x, model_name)
            x = _batch_standardize(x, w)
            logits = model_def.apply({"params": params}, x, train=False)
            t1 = jnp.sum((jnp.argmax(logits, -1) == y) * w)
            _, pred3 = jax.lax.top_k(logits, k=min(3, num_classes))
            t3 = jnp.sum((pred3 == y[:, None]).any(axis=1) * w)
            _, pred5 = jax.lax.top_k(logits, k=min(5, num_classes))
            t5 = jnp.sum((pred5 == y[:, None]).any(axis=1) * w)
            pc_corr, pc_cnt = per_class_correct(logits, y, num_classes, w)
            return carry, (t1, t3, t5, jnp.sum(w), pc_corr, pc_cnt)

        _, (t1, t3, t5, n, pc_corr, pc_cnt) = jax.lax.scan(
            batch, 0, (clips_u8, labels, weights))
        return (t1.sum(), t3.sum(), t5.sum(), n.sum(),
                pc_corr.sum(0), pc_cnt.sum(0))

    return jax.jit(run, compiler_options=tpu_compiler_options()), model_def


def _stack_test_batches(clips: np.ndarray, labels: np.ndarray,
                        batch: int = TEST_BATCH):
    n = clips.shape[0]
    nb = _cdiv(n, batch)
    pad = nb * batch - n
    if pad:
        clips = np.concatenate([clips, np.zeros((pad,) + clips.shape[1:],
                                                clips.dtype)])
        labels = np.concatenate([labels, np.zeros(pad, labels.dtype)])
    weights = np.ones(nb * batch, np.float32)
    if pad:
        weights[-pad:] = 0.0
    return (clips.reshape((nb, batch) + clips.shape[1:]),
            labels.reshape(nb, batch).astype(np.int32),
            weights.reshape(nb, batch))


@dataclasses.dataclass
class EvalResult:
    acc_train: float
    acc_test: float
    acc_per_class: np.ndarray
    top1: float
    top3: float
    top5: float
    params: Any = None


def sample_test_batches(data: VideoData, cfg: EvalConfig,
                        test_rng: np.random.Generator):
    """Draw test_repeats sets of random temporal crops, stacked into
    device-resident uint8 batch arrays. Sharing one draw across the
    num_eval models keeps the host->device traffic to test_repeats
    uploads instead of num_eval x test_repeats (statistically identical:
    the crops are i.i.d. either way — see PARITY.md)."""
    from ..parallel import get_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = get_mesh()
    if mesh.devices.size > 1 and TEST_BATCH % mesh.devices.size == 0:
        sh = NamedSharding(mesh, P(None, "data"))  # (nb, B, ...) over B
        put = lambda a: jax.device_put(a, sh)  # noqa: E731
    else:
        put = jax.device_put
    batches = []
    for _ in range(cfg.test_repeats):
        clips = data.test.sample_clips(test_rng,
                                       flip=data.meta.frames > 1)
        cb, lb, wb = _stack_test_batches(clips, data.test.labels)
        batches.append((put(cb), put(lb), put(wb)))
    return batches


def evaluate_synset(key, syn_images, syn_labels, data: VideoData,
                    cfg: EvalConfig, test_rng: np.random.Generator,
                    s2d_cfg: Optional[S2DConfig] = None,
                    s2d_state=None, test_batches=None) -> EvalResult:
    """Train one fresh net on the synthetic set and test it.

    ``syn_images`` live in normalised (post-ImageNet-transform) space, as in
    the reference. For ``cfg.mode == 'multi-static'`` pass ``s2d_state`` and
    ``s2d_cfg`` instead of raw images.
    """
    meta = data.meta
    if cfg.mode == "multi-static":
        assert s2d_cfg is not None and s2d_state is not None
        n_syn = s2d_cfg.num_classes * (5 if s2d_cfg.spc == 10 else 1)
        s2d_key = tuple(sorted(dataclasses.asdict(s2d_cfg).items()))
        syn_arg = s2d_state
        labels_arg = jnp.zeros((n_syn,), jnp.int32)
    else:
        n_syn = int(syn_images.shape[0])
        s2d_key = None
        syn_arg = syn_images
        labels_arg = (jnp.asarray(syn_labels, jnp.float32)
                      if cfg.loss == "mse"
                      else jnp.asarray(syn_labels, jnp.int32))

    train_fn, _ = _build_train_fn(
        cfg.model, meta.channel, meta.num_classes, tuple(meta.im_size),
        meta.frames, n_syn, cfg, s2d_key)
    params, acc_train, _ = train_fn(key, syn_arg, labels_arg,
                                    jnp.asarray(cfg.lr_net, jnp.float32))

    test_fn, _ = _build_test_fn(cfg.model, meta.channel, meta.num_classes,
                                tuple(meta.im_size), meta.frames,
                                tuple(meta.mean), tuple(meta.std))
    if test_batches is None:
        test_batches = sample_test_batches(data, cfg, test_rng)
    tot = np.zeros(4)
    pc_corr = np.zeros(meta.num_classes)
    pc_cnt = np.zeros(meta.num_classes)
    for cb, lb, wb in test_batches:
        t1, t3, t5, n, pcc, pcn = test_fn(params, cb, lb, wb)
        tot += np.array([float(t1), float(t3), float(t5), float(n)])
        pc_corr += np.asarray(pcc)
        pc_cnt += np.asarray(pcn)

    top1, top3, top5 = tot[0] / tot[3], tot[1] / tot[3], tot[2] / tot[3]
    acc_per_class = np.where(pc_cnt > 0, pc_corr / np.maximum(pc_cnt, 1),
                             np.nan)
    acc_test = [top1, top1, top3, top5] if cfg.eval_mode == "top5" else top1
    return EvalResult(acc_train=float(acc_train), acc_test=acc_test,
                      acc_per_class=acc_per_class, top1=top1, top3=top3,
                      top5=top5, params=params)


def evaluate_many(base_key, num_eval: int, syn_images, syn_labels,
                  data: VideoData, cfg: EvalConfig,
                  test_rng: np.random.Generator,
                  s2d_cfg: Optional[S2DConfig] = None, s2d_state=None,
                  vmap_eval: bool = False):
    """The reference's num_eval loop (distill_baseline.py:154-162): fresh
    nets, mean/std over runs.

    ``vmap_eval=True`` trains all num_eval nets in ONE vmapped jit and
    shares each test pass across them — a TPU-native batching of the
    protocol (identical per-net semantics; fresh nets = fresh keys).
    """
    if vmap_eval:
        return _evaluate_many_vmapped(base_key, num_eval, syn_images,
                                      syn_labels, data, cfg, test_rng,
                                      s2d_cfg=s2d_cfg, s2d_state=s2d_state)
    results = []
    test_batches = sample_test_batches(data, cfg, test_rng)
    for i in range(num_eval):
        k = jax.random.fold_in(base_key, i)
        results.append(evaluate_synset(k, syn_images, syn_labels, data, cfg,
                                       test_rng, s2d_cfg, s2d_state,
                                       test_batches=test_batches))
    accs = np.array([r.top1 if cfg.eval_mode != "top5" else r.top5
                     for r in results])
    return results, float(accs.mean()), float(accs.std())


def _evaluate_many_vmapped(base_key, num_eval, syn_images, syn_labels,
                           data: VideoData, cfg: EvalConfig,
                           test_rng: np.random.Generator,
                           s2d_cfg: Optional[S2DConfig] = None,
                           s2d_state=None):
    meta = data.meta
    if cfg.mode == "multi-static":
        # S2D: vmap over fresh net keys with the (frozen) synthetic state
        # broadcast — trains all num_eval nets in one compiled scan
        assert s2d_cfg is not None and s2d_state is not None
        n_syn = s2d_cfg.num_classes * (5 if s2d_cfg.spc == 10 else 1)
        s2d_key = tuple(sorted(dataclasses.asdict(s2d_cfg).items()))
        syn_arg = s2d_state
        labels_arg = jnp.zeros((n_syn,), jnp.int32)
    else:
        n_syn = int(syn_images.shape[0])
        s2d_key = None
        syn_arg = syn_images
        labels_arg = (jnp.asarray(syn_labels, jnp.float32)
                      if cfg.loss == "mse"
                      else jnp.asarray(syn_labels, jnp.int32))
    train_fn, _ = _build_train_fn(
        cfg.model, meta.channel, meta.num_classes, tuple(meta.im_size),
        meta.frames, n_syn, cfg, s2d_key)
    keys = jax.random.split(base_key, num_eval)
    params, acc_train, _ = jax.vmap(
        train_fn, in_axes=(0, None, None, None))(
        keys, syn_arg, labels_arg, jnp.asarray(cfg.lr_net, jnp.float32))

    test_fn, _ = _build_test_fn(cfg.model, meta.channel, meta.num_classes,
                                tuple(meta.im_size), meta.frames,
                                tuple(meta.mean), tuple(meta.std))
    vtest = jax.vmap(test_fn, in_axes=(0, None, None, None))
    tot = np.zeros((num_eval, 4))
    pc_corr = np.zeros((num_eval, meta.num_classes))
    pc_cnt = np.zeros((num_eval, meta.num_classes))
    for cb, lb, wb in sample_test_batches(data, cfg, test_rng):
        t1, t3, t5, n, pcc, pcn = vtest(params, cb, lb, wb)
        tot += np.stack([np.asarray(t1), np.asarray(t3), np.asarray(t5),
                         np.asarray(n)], axis=1)
        pc_corr += np.asarray(pcc)
        pc_cnt += np.asarray(pcn)
    results = []
    for i in range(num_eval):
        top1 = tot[i, 0] / tot[i, 3]
        top3 = tot[i, 1] / tot[i, 3]
        top5 = tot[i, 2] / tot[i, 3]
        acc_pc = np.where(pc_cnt[i] > 0,
                          pc_corr[i] / np.maximum(pc_cnt[i], 1), np.nan)
        acc_test = [top1, top1, top3, top5] if cfg.eval_mode == "top5" \
            else top1
        results.append(EvalResult(
            acc_train=float(acc_train[i]), acc_test=acc_test,
            acc_per_class=acc_pc, top1=top1, top3=top3, top5=top5))
    accs = np.array([r.top1 if cfg.eval_mode != "top5" else r.top5
                     for r in results])
    return results, float(accs.mean()), float(accs.std())
