"""MTT — Matching Training Trajectories, as a remat'd ``lax.scan`` unroll.

Parity with the reference MTT branches
(``/root/reference/distill_baseline.py:117-290``,
``distill_s2d_ms.py:113-310``): sample an expert trajectory segment
(θ_start = traj[e], θ_target = traj[e + expert_epochs]); run ``syn_steps``
SGD steps on the synthetic data from θ_start with learnable scalar lr
(``syn_lr``); minimise ‖θ_K − θ*‖²/‖θ_0 − θ*‖² through the whole unroll
into the synthetic parameters; synthetic optimizers are SGD(momentum 0.5)
(raw, distill_baseline.py:107-108) / SGD(momentum 0.95) for S2D memories and
0.9 for the lr (distill_s2d_ms.py:105-108); ``syn_lr`` is clipped at 0.001
after each update (distill_baseline.py:283).

The torch version holds the whole ``create_graph=True`` autograd graph in
memory; here ``jax.checkpoint`` on the inner step rematerialises inner
forwards during the outer backward — the TPU-native replacement
(SURVEY.md §7 "hard parts").

Batch plan semantics: the reference pops permutation chunks from the END of
a per-iteration chunk list (``distill_baseline.py:231-241``,
``list.pop()``), refilling when empty; ragged remainder chunks are padded
here with -1 and masked in the CE mean.
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from ..models import layers as _layers
from ..models.convnet3d import ConvNet3D
from ..models.layers import s2d2_pack
from ..models.registry import create_model
from ..utils.xla_opts import tpu_compiler_options
from .s2d import S2DConfig, hallucinate

PACK_AT_STAGING = False  # measured net-loss on v5e; see layers.s2d2_pack


def make_batch_plan(rng: np.random.Generator, n: int, batch_syn: int,
                    syn_steps: int, leftover: Optional[list] = None):
    """(syn_steps, batch_syn) int32 plan with -1 padding, reproducing the
    reference's pop-from-end chunking. ``leftover`` (mutated) carries
    unconsumed chunks across outer iterations within one buffer epoch —
    the reference resets it each iteration, so callers pass None."""
    chunks = list(leftover) if leftover else []
    plan = np.full((syn_steps, batch_syn), -1, np.int32)
    for s in range(syn_steps):
        if not chunks:
            perm = rng.permutation(n)
            chunks = [perm[i:i + batch_syn]
                      for i in range(0, n, batch_syn)]
        chunk = chunks.pop()
        plan[s, :len(chunk)] = chunk
    return plan


@jax.custom_vjp
def take_rows(mat, idx):
    """Row gather whose backward is a one-hot matmul instead of XLA's
    scatter-add: the (k, n) one-hot times the (k, D) cotangent runs on
    the MXU (~0.4 ms for the S2D dynamic memory) where the scatter ran
    at ~36 GB/s (~11 ms). Forward is a plain gather (cheap both ways)."""
    return mat[idx]


def _take_rows_fwd(mat, idx):
    return mat[idx], (idx, mat.shape[0])


def _take_rows_bwd(res, g):
    idx, n = res
    oh = jax.nn.one_hot(idx, n, dtype=g.dtype)  # (k, n)
    gm = oh.T @ g  # (n, D) dense accumulation on the MXU
    return gm, np.zeros(idx.shape, jax.dtypes.float0)


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


def flat_param_template(model_name: str, channel: int, num_classes: int,
                        im_size, frames: int, seed: int = 0):
    """(template_params, flat (P,), unravel_fn) — the JAX-native
    ReparamModule (reparam_module.py): params are a pytree, the flat view is
    free via ravel_pytree."""
    model_def = create_model(model_name, channel, num_classes,
                             tuple(im_size), frames)
    k = jax.random.PRNGKey(seed)
    sample = jnp.zeros((1, frames, im_size[0], im_size[1], channel))
    params = model_def.init({"params": k, "dropout": k}, sample,
                            train=False)["params"]
    flat, unravel = ravel_pytree(params)
    return model_def, params, flat, unravel


def resolve_hvp_config():
    """Dtype + fp32-island stages for the second-order (HVP) pass, from
    the env (read at step-build time; _build_* are lru-cached, so flip
    these only in a fresh process — scripts/bisect_bf16_hvp.py).

    VD_HVP_DTYPE ∈ {bfloat16 (default), float32}. VD_HVP_FP32_STAGES:
    absent -> the validated default island ("head",); present (even
    empty) -> exactly the named stages. Rationale: the fully-bf16 HVP
    overflows at flagship shapes and the r5 bisection localized the
    overflow to the ConvNet3D head stage — bf16 HVP + fp32 head island
    is finite and recovers most of the blanket-fp32 ~23% tax
    (BASELINE.md round-5 section).
    """
    dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        _os.environ.get("VD_HVP_DTYPE", "bfloat16")]
    env_stages = _os.environ.get("VD_HVP_FP32_STAGES")
    if env_stages is None:
        stages = ("head",)
    else:
        stages = tuple(s for s in env_stages.split(",") if s)
    return dt, stages


@functools.lru_cache(maxsize=16)
def _build_mtt_core(model_name: str, channel: int, num_classes: int,
                    im_size: Tuple[int, int], frames: int, syn_steps: int,
                    compute_dtype: str, second_order: str = "rof"):
    """The inner unroll: (syn_videos_fn-composed batches, θ_start, syn_lr)
    -> grand loss. Shared by the raw and S2D outer steps.

    ``second_order`` picks how the outer backward differentiates the inner
    CE-grad:

    * ``"rof"`` (default): a custom VJP whose backward is
      grad-of-a-jvp (reverse-over-forward). The VJP of
      g(θ,x) = ∇_θ ce(θ,x) at cotangent v is
      ∇_{θ,x} (v·∇_θ ce) = ∇_{θ,x} jvp(ce, (θ,x), (v,0)) — one
      linearised forward + one transpose, instead of the remat'd
      reverse-over-reverse XLA otherwise builds (~2x faster on the
      v5e at the miniUCF101 shapes).
    * ``"remat"``: the round-1 path — jax.checkpoint on the inner step,
      reverse-over-reverse in the outer backward.
    """
    model_def, _, _, unravel = flat_param_template(
        model_name, channel, num_classes, im_size, frames)
    # Staging the unroll batches PRE-packed (s2d2_pack + packed_input
    # model) was measured a NET LOSS on the v5e — see the note on
    # layers.s2d2_pack — so it is off by default; the capability stays
    # (tested) for shapes where the trade flips.
    packed = (PACK_AT_STAGING and isinstance(model_def, ConvNet3D)
              and ConvNet3D.supports_packed_input(
                  model_def.net_pooling, model_def.net_norm,
                  model_def.net_act, model_def.im_size))
    if packed:
        model_def = model_def.clone(packed_input=True)
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    # Conv lowering for the MTT unroll: on CPU, XLA emits the in-scan
    # weight-gradients of the stride-2 convs (first- and second-order)
    # as rhs-dilated convolutions with no fast path (~170 s/outer step
    # at the 4-class 64^2 test shapes, ~35x slower than the torch
    # reference); the im2col-GEMM lowering (layers._conv2d) keeps every
    # derivative a slice/pad/dot and runs the same step in ~30 s. TPU
    # keeps native convs. VD_MTT_CONV ∈ {auto, native, gemm, gemmsum}.
    _hvp_conv = _os.environ.get("VD_MTT_CONV", "auto")
    if _hvp_conv == "auto":
        _hvp_conv = "gemm" if jax.default_backend() == "cpu" else "native"

    def ce_in(dt, conv=None, fp32_stages=()):
        def ce(th, x, y, w, step_i, drop_key):
            # mixed precision: bf16 conv compute, fp32 master θ —
            # casting only x would promote convs back to fp32
            p = jax.tree.map(lambda a: a.astype(dt), unravel(th))
            with _layers.conv_impl(conv or _layers.CONV_IMPL), \
                    _layers.fp32_stages(fp32_stages):
                logits = model_def.apply(
                    {"params": p}, x.astype(dt), train=True,
                    rngs={"dropout": jax.random.fold_in(drop_key, step_i)})
            logits = logits.astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            pick = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
            return jnp.sum(pick * w) / jnp.maximum(jnp.sum(w), 1.0)
        return ce

    # The whole unroll gets the lowering, not just the HVP: the
    # FIRST-order wgrads are only fast on CPU when XLA can rewrite them
    # outside a loop body — embedded in the scan they hit the same
    # dilated-conv scalar loop (measured: the in-scan "native" ce_grad
    # costs ~20 s/step at test shapes while an isolated jax.grad of the
    # same ce runs 0.42 s).
    ce = ce_in(cdt, conv=_hvp_conv)
    # The reverse-over-forward second-order pass: at flagship shapes
    # (112^2 x 16, syn_steps=10) the fully-bf16 HVP produces inf/nan on
    # the FIRST outer step regardless of cotangent scaling, while fp32
    # is clean (r3 postmortem, BASELINE.md). The r5 bisection localized
    # the overflow to the ConvNet3D "head" stage, so the default is now
    # a bf16 HVP with an fp32 island at only that stage — see
    # resolve_hvp_config() for the knobs/rationale.
    _hvp_dt, _hvp_stages = resolve_hvp_config()
    ce_hvp = ce_in(_hvp_dt if compute_dtype == "bfloat16" else jnp.float32,
                   conv=_hvp_conv, fp32_stages=_hvp_stages)

    def _float0(a):
        return np.zeros(a.shape, jax.dtypes.float0)

    # NB: drop_key/step_i must be explicit ce_grad arguments — inside the
    # jitted step they are tracers, and custom_vjp functions may not close
    # over tracers ("No constant handler" at trace time).
    @jax.custom_vjp
    def ce_grad(theta, x, y, w, step_i, drop_key):
        return jax.grad(ce)(theta, x, y, w, step_i, drop_key)

    def ce_grad_fwd(theta, x, y, w, step_i, drop_key):
        g = jax.grad(ce)(theta, x, y, w, step_i, drop_key)
        return g, (theta, x, y, w, step_i, drop_key)

    def ce_grad_bwd(res, v):
        theta, x, y, w, step_i, drop_key = res

        def hvp_target(th, xx):
            return jax.jvp(
                lambda t: ce_hvp(t, xx, y, w, step_i, drop_key), (th,),
                (v,))[1]

        gt, gx = jax.grad(hvp_target, argnums=(0, 1))(theta, x)
        return (gt, gx, _float0(y), jnp.zeros_like(w), _float0(step_i),
                _float0(drop_key))

    ce_grad.defvjp(ce_grad_fwd, ce_grad_bwd)

    def unroll(theta_start, theta_target, syn_lr, batches_x, batches_y,
               batches_w, drop_key):
        """batches_x: (S, B, F, H, W, C) (already in normalised space);
        returns grand_loss, plus (param_loss, param_dist)."""
        if packed:
            S, B = batches_x.shape[:2]
            xp = s2d2_pack(batches_x.reshape((S * B,) +
                                             batches_x.shape[2:]))
            batches_x = xp.reshape((S, B) + xp.shape[1:])

        if second_order == "rof":

            def inner(theta, inp):
                x, y, w, step_i = inp
                g = ce_grad(theta, x, y, w, step_i, drop_key)
                return theta - syn_lr * g, None

        elif second_order == "remat":

            @jax.checkpoint
            def inner(theta, inp):
                x, y, w, step_i = inp
                g = jax.grad(ce)(theta, x, y, w, step_i, drop_key)
                return theta - syn_lr * g, None

        elif second_order == "full":
            # no remat, no custom VJP: scan saves every step's residuals
            # (all activations); the outer backward reuses them instead of
            # recomputing. Highest memory, fewest FLOPs.

            def inner(theta, inp):
                x, y, w, step_i = inp
                g = jax.grad(ce)(theta, x, y, w, step_i, drop_key)
                return theta - syn_lr * g, None

        else:
            raise ValueError(f"unknown second_order mode: {second_order}")

        if _os.environ.get("VD_MTT_UNROLL") == "1":
            # Diagnostic-only Python unroll: jax_debug_nans cannot see
            # inside a lax.scan body (it reports "nan in scan"); the
            # unrolled graph lets it name the exact primitive. Slower to
            # compile; never use for training.
            theta = theta_start
            for s in range(syn_steps):
                theta, _ = inner(theta, (batches_x[s], batches_y[s],
                                         batches_w[s], jnp.asarray(s)))
            theta_final = theta
        else:
            steps = jnp.arange(syn_steps)
            theta_final, _ = jax.lax.scan(
                inner, theta_start, (batches_x, batches_y, batches_w, steps))
        param_loss = jnp.sum((theta_final - theta_target) ** 2)
        param_dist = jnp.sum((theta_start - theta_target) ** 2)
        return param_loss / param_dist, (param_loss, param_dist)

    return unroll


@functools.lru_cache(maxsize=16)
def _build_mtt_step(model_name: str, channel: int, num_classes: int,
                    im_size: Tuple[int, int], frames: int, syn_steps: int,
                    lr_img: float, lr_lr: float, train_lr: bool,
                    compute_dtype: str, second_order: str = "rof"):
    unroll = _build_mtt_core(model_name, channel, num_classes, im_size,
                             frames, syn_steps, compute_dtype, second_order)

    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    def step(key, syn_images, syn_labels, syn_lr, mom_img, mom_lr,
             theta_start, theta_target, plan):
        w = (plan >= 0).astype(jnp.float32)
        safe = jnp.maximum(plan, 0)
        batches_y = syn_labels[safe]

        def loss_fn(syn, lr_scalar):
            item = syn.shape[1:]
            # gather + stage the unroll batches in the compute dtype:
            # halves the scan-input HBM traffic; the model casts to cdt
            # anyway, and grads flow back through the cast into fp32 syn
            syn2d = syn.astype(cdt).reshape(syn.shape[0], -1)
            batches_x = take_rows(syn2d, safe.reshape(-1)).reshape(
                safe.shape + item)
            loss, aux = unroll(theta_start, theta_target, lr_scalar,
                               batches_x, batches_y, w, key)
            return loss, aux

        (loss, (ploss, pdist)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(syn_images, syn_lr)
        g_img, g_lr = grads
        mom_img = 0.5 * mom_img + g_img
        syn_images = syn_images - lr_img * mom_img
        if train_lr:
            mom_lr = 0.5 * mom_lr + g_lr
            syn_lr = jnp.maximum(syn_lr - lr_lr * mom_lr, 0.001)
        return syn_images, syn_lr, mom_img, mom_lr, loss, ploss, pdist

    return jax.jit(step, donate_argnums=(1, 3, 4, 5),
                   compiler_options=tpu_compiler_options())


@functools.lru_cache(maxsize=16)
def _build_s2d_mtt_step(model_name: str, channel: int, num_classes: int,
                        im_size: Tuple[int, int], frames: int,
                        syn_steps: int, s2d_items: tuple, lr_static: float,
                        lr_dynamic: float, lr_hal: float, lr_lr: float,
                        train_static: bool, train_lr: bool,
                        compute_dtype: str, second_order: str = "rof"):
    unroll = _build_mtt_core(model_name, channel, num_classes, im_size,
                             frames, syn_steps, compute_dtype, second_order)
    s2d_cfg = S2DConfig(**dict(s2d_items))

    def step(key, s2d_state, syn_lr, moms, mom_lr, theta_start,
             theta_target, plan):
        k_slots, k_drop = jax.random.split(key)
        w = (plan >= 0).astype(jnp.float32)
        safe = jnp.maximum(plan, 0)

        # slot draws per inner step (distill_s2d_ms.py:240-247)
        def draw(i, idx_row):
            kk = jax.random.fold_in(k_slots, i)
            k1, k2 = jax.random.split(kk)
            label = idx_row // s2d_cfg.vpc
            sub = idx_row % s2d_cfg.vpc
            d_idx = 2 * sub + jax.random.randint(k1, idx_row.shape, 0, 2)
            s_idx = s2d_cfg.spc * label + 2 * sub + \
                jax.random.randint(k2, idx_row.shape, 0, 2)
            return label, s_idx, d_idx

        labels, s_idxs, d_idxs = jax.vmap(draw)(jnp.arange(syn_steps), safe)

        def loss_fn(state, lr_scalar):
            st = state["static"]
            if not train_static:
                # frozen static (the sh/ ipc=1 presets): cut the whole
                # static backward chain (hal dgrad_s + one-hot gather
                # transpose) instead of computing-and-discarding it
                st = jax.lax.stop_gradient(st)
            static = take_rows(
                st.reshape(st.shape[0], -1),
                s_idxs.reshape(-1)).reshape((-1,) + st.shape[1:])
            dy = state["dynamic"]
            flat_idx = labels.reshape(-1) * dy.shape[1] + d_idxs.reshape(-1)
            dynamic = take_rows(
                dy.reshape(dy.shape[0] * dy.shape[1], -1),
                flat_idx).reshape((-1,) + dy.shape[2:])
            # compose + stage the unroll batches in the compute dtype
            cdt = jnp.bfloat16 if compute_dtype == "bfloat16" \
                else jnp.float32
            videos = hallucinate(state["hals"][0], static, dynamic,
                                 s2d_cfg.hal_mode, dtype=cdt)
            batches_x = videos.reshape(
                (syn_steps, -1) + videos.shape[1:])
            loss, aux = unroll(theta_start, theta_target, lr_scalar,
                               batches_x, labels, w, k_drop)
            return loss, aux

        (loss, (ploss, pdist)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(s2d_state, syn_lr)
        g_state, g_lr = grads

        new_state, new_moms = {}, {}
        for name, lr, train in (("static", lr_static, train_static),
                                ("dynamic", lr_dynamic, True),
                                ("hals", lr_hal, True)):
            if not train:
                new_state[name] = s2d_state[name]
                new_moms[name] = moms[name]
                continue
            m = jax.tree.map(lambda mm, g: 0.95 * mm + g, moms[name],
                             g_state[name])
            new_state[name] = jax.tree.map(lambda p, mm: p - lr * mm,
                                           s2d_state[name], m)
            new_moms[name] = m
        if train_lr:
            mom_lr = 0.9 * mom_lr + g_lr
            syn_lr = jnp.maximum(syn_lr - lr_lr * mom_lr, 0.001)
        return new_state, syn_lr, new_moms, mom_lr, loss, ploss, pdist

    return jax.jit(step, donate_argnums=(1, 2, 3, 4),
                   compiler_options=tpu_compiler_options())


@dataclasses.dataclass
class TrajectoryBuffer:
    """Expert trajectories as stacked flat-param arrays.

    The reference pickles python lists of per-layer tensors
    (buffer.py:89-104); here each expert is a dense (E+1, P) float32 array —
    directly sliceable into θ_start/θ_target device arrays.
    """

    trajectories: np.ndarray  # (num_experts, E+1, P)

    def __len__(self):
        return self.trajectories.shape[0]

    @property
    def num_epochs(self):
        return self.trajectories.shape[1]

    def segment(self, expert: int, start_epoch: int, expert_epochs: int):
        t = self.trajectories[expert]
        return t[start_epoch], t[start_epoch + expert_epochs]

    def save(self, path: str):
        np.savez_compressed(path, trajectories=self.trajectories)

    @staticmethod
    def load(path: str) -> "TrajectoryBuffer":
        with np.load(path) as z:
            return TrajectoryBuffer(z["trajectories"])


class ExpertSampler:
    """Reference expert-iteration order (distill_baseline.py:122-135,
    :203-211): shuffle the buffer files, walk experts sequentially,
    reshuffle on wrap; start epoch ~ U[0, max_start_epoch)."""

    def __init__(self, buffers, rng: np.random.Generator):
        self.buffers = list(buffers)
        self.rng = rng
        self.rng.shuffle(self.buffers)
        self.file_idx = 0
        self.expert_idx = 0
        self._order = None
        self._reshuffle()

    def _reshuffle(self):
        n = len(self.buffers[self.file_idx])
        self._order = self.rng.permutation(n)

    def next_trajectory(self):
        buf = self.buffers[self.file_idx]
        traj_i = int(self._order[self.expert_idx])
        self.expert_idx += 1
        if self.expert_idx == len(buf):
            self.expert_idx = 0
            self.file_idx += 1
            if self.file_idx == len(self.buffers):
                self.file_idx = 0
                self.rng.shuffle(self.buffers)
            self._reshuffle()
        return buf, traj_i

    def sample_segment(self, max_start_epoch: int, expert_epochs: int):
        buf, traj_i = self.next_trajectory()
        start_epoch = int(self.rng.integers(0, max_start_epoch))
        theta_start, theta_target = buf.segment(traj_i, start_epoch,
                                                expert_epochs)
        return theta_start, theta_target, start_epoch
