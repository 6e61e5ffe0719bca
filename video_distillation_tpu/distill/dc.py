"""DC — Dataset Condensation with gradient matching (static learning).

The reference advertises ``--method DC`` (``distill_baseline.py:370``) and
directs static-memory learning to the DC algorithm over the single-frame
datasets (``README.md`` "Static Learning"; loaders ``singleUCF50`` etc. at
``distill_utils/dataset.py:18-77,897-946``). The loss machinery lives at
``utils.py:634-709`` (``distance_wb``/``match_loss``/``get_loops``) — this
module wires it into the canonical DC loop:

    per iteration: fresh net; for each outer step: per-class
    ``match_loss(∂CE(syn_c)/∂θ, stopgrad(∂CE(real_c)/∂θ))`` summed over
    classes -> SGD(momentum 0.5) on the synthetic images; then
    ``inner_loop`` SGD steps training the net on the synthetic set.

TPU-first: the per-class loop is a ``lax.map`` over a pre-gathered
``(C, B, H, W, Ch)`` real batch; each class's second-order gradient path is
rematerialised.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.store import ClipStore
from ..models.registry import create_model
from ..ops.losses import match_loss


def get_loops(ipc: int) -> Tuple[int, int]:
    """utils.py:691-709."""
    table = {1: (1, 1), 5: (1, 1), 10: (10, 50), 20: (20, 25),
             30: (30, 20), 40: (40, 15), 50: (50, 10)}
    if ipc not in table:
        raise ValueError(f"loop hyper-parameters not defined for {ipc} ipc")
    return table[ipc]


@functools.lru_cache(maxsize=16)
def _build_dc_step(model_name: str, channel: int, num_classes: int,
                   im_size: Tuple[int, int], ipc: int, batch_real: int,
                   lr_img: float, lr_net: float, inner_loop: int,
                   dis_metric: str):
    model_def = create_model(model_name, channel, num_classes, im_size, 1)

    def ce(params, x, y):
        logits = model_def.apply({"params": params}, x, train=True)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, y[:, None], axis=-1).mean()

    def init_net(key, sample):
        params = model_def.init({"params": key, "dropout": key},
                                sample, train=False)["params"]
        return params, jax.tree.map(jnp.zeros_like, params)

    def match_step(params, syn_images, syn_labels, mom, clips_u8,
                   real_idx, norm_mean, norm_std):
        """One DC outer (gradient-matching) step against the CURRENT net
        params; the net is NOT re-initialised here — it persists and is
        trained between outer steps (canonical DC semantics)."""
        real = clips_u8[real_idx.reshape(-1)].reshape(
            (num_classes, batch_real) + im_size + (channel,))
        real = ((real.astype(jnp.float32) - norm_mean) / norm_std)
        syn_by_class = syn_images.reshape((num_classes, ipc) +
                                          syn_images.shape[1:])

        def loss_fn(syn_c_all):
            @jax.checkpoint
            def per_class(c):
                y_real = jnp.full((batch_real,), c, jnp.int32)
                y_syn = jnp.full((ipc,), c, jnp.int32)
                gw_real = jax.lax.stop_gradient(
                    jax.grad(ce)(params, real[c], y_real))
                gw_syn = jax.grad(ce)(params, syn_c_all[c], y_syn)
                return match_loss(gw_syn, gw_real, dis_metric)

            losses = jax.lax.map(per_class, jnp.arange(num_classes))
            return jnp.sum(losses)

        loss, grads = jax.value_and_grad(loss_fn)(syn_by_class)
        grads = grads.reshape(syn_images.shape)
        mom = 0.5 * mom + grads
        syn_images = syn_images - lr_img * mom
        return syn_images, mom, loss

    def inner_train(params, net_mom, syn_images, syn_labels):
        """inner_loop SGD steps training the net on the synthetic set
        (plain SGD momentum 0.5, per DC's epoch())."""
        def inner(carry, i):
            p, m = carry
            g = jax.grad(ce)(p, syn_images, syn_labels)
            m = jax.tree.map(lambda mm, gg: 0.5 * mm + gg, m, g)
            p = jax.tree.map(lambda pp, mm: pp - lr_net * mm, p, m)
            return (p, m), None

        (params, net_mom), _ = jax.lax.scan(inner, (params, net_mom),
                                            jnp.arange(inner_loop))
        return params, net_mom

    return (jax.jit(init_net), jax.jit(match_step, donate_argnums=(1, 3)),
            jax.jit(inner_train, donate_argnums=(0, 1)))


def make_dc_trainer(store: ClipStore, model_name: str, ipc: int,
                    batch_real: int, lr_img: float, lr_net: float,
                    dis_metric: str = "ours"):
    """DC trainer over an image ClipStore (clips shaped (N,H,W,C))."""
    meta = store.meta
    outer_loop, inner_loop = get_loops(ipc)
    init_fn, match_fn, inner_fn = _build_dc_step(
        model_name, meta.channel, meta.num_classes, tuple(meta.im_size),
        ipc, batch_real, lr_img, lr_net, inner_loop, dis_metric)
    clips_dev = store.device_clips()
    norm_mean = jnp.asarray(meta.mean, jnp.float32) * 255.0
    norm_std = jnp.asarray(meta.std, jnp.float32) * 255.0

    def step(key, syn_images, syn_labels, mom, np_rng):
        # ONE fresh net per iteration; it persists across the outer_loop
        # steps and is trained on the synthetic set between them (not after
        # the last — the canonical DC schedule)
        params, net_mom = init_fn(jax.random.fold_in(key, 0),
                                  syn_images[:1])
        loss_total = 0.0
        for ol in range(outer_loop):
            idx = jnp.asarray(store.sample_per_class(np_rng, batch_real))
            syn_images, mom, loss = match_fn(
                params, syn_images, syn_labels, mom, clips_dev, idx,
                norm_mean, norm_std)
            loss_total += float(loss)
            if inner_loop > 0 and ol < outer_loop - 1:
                params, net_mom = inner_fn(params, net_mom, syn_images,
                                           syn_labels)
        return syn_images, mom, loss_total / max(1, outer_loop)

    return step
