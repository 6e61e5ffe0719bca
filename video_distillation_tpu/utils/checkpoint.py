"""Checkpoint / resume for distillation runs.

The reference torch drivers save only output artifacts
(``images_{it}.pt``/``dynamic_{it}.pt``/``hal_{it}.pt`` —
``distill_s2d_ms.py:175-193``) and cannot resume a run; only the FRePo JAX
path has real resume (``frepo.py:451-454``). Here the FULL distillation
state — synthetic pytree, optimizer momenta, learnable syn_lr, iteration,
host RNG state — is checkpointed with orbax so any run resumes exactly
(SURVEY.md §5 "checkpoint/resume").
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_state(path: str, state: Any, step: int,
               host_rng: Optional[np.random.Generator] = None):
    """Save a pytree + host RNG; path is a directory.

    Multi-host: only process 0 writes (the reference FRePo's pmap-aware
    save-from-process-0 rule, ``FRePo/lib/training/utils.py:192-196``);
    all processes still participate in the device_get of sharded arrays.
    """
    path = os.path.abspath(path)
    state = jax.device_get(state)
    if jax.process_index() != 0:
        return
    os.makedirs(path, exist_ok=True)
    if _HAVE_ORBAX:
        ckpt_dir = os.path.join(path, f"step_{step}")
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(ckpt_dir, state, force=True)
    else:  # pragma: no cover
        with open(os.path.join(path, f"step_{step}.pkl"), "wb") as f:
            pickle.dump(state, f)
    meta = {"step": step}
    if host_rng is not None:
        meta["rng_state"] = host_rng.bit_generator.state
    with open(os.path.join(path, "latest.pkl"), "wb") as f:
        pickle.dump(meta, f)


def latest_step(path: str) -> Optional[int]:
    meta_path = os.path.join(path, "latest.pkl")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path, "rb") as f:
        return pickle.load(f)["step"]


def _migrate_legacy(tree: Any, template: Any):
    """Lift pre-r3 checkpoint layouts into the current structure:

    * hallucinator params were nested ``{'TorchConv_0': {'Conv_0':
      {kernel, bias}}}`` before the Pallas primitive flattened them to
      ``{kernel, bias}`` (models/hallucinator.py) — unwrap the nesting;
    * scalar leaves standing where the template holds a vector (the FRePo
      driver's ``best_acc`` went scalar -> per-model vector) broadcast.
    """
    if isinstance(tree, dict):
        while (set(tree.keys()) <= {"TorchConv_0", "Conv_0"}
               and len(tree) == 1):
            tree = next(iter(tree.values()))
        if isinstance(template, dict):
            return {k: _migrate_legacy(tree.get(k), template[k])
                    for k in template}
        return tree
    if isinstance(tree, (list, tuple)) and isinstance(template,
                                                      (list, tuple)):
        return type(template)(_migrate_legacy(t, tt)
                              for t, tt in zip(tree, template))
    if tree is None:
        return template
    arr = np.asarray(tree)
    tmpl = np.asarray(template)
    if arr.shape != tmpl.shape and arr.size == 1:
        return np.broadcast_to(arr.reshape(()), tmpl.shape).astype(
            tmpl.dtype).copy()
    return tree


def restore_state(path: str, template: Any):
    """Returns (state, step, rng_state|None) or None if no checkpoint."""
    path = os.path.abspath(path)
    meta_path = os.path.join(path, "latest.pkl")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path, "rb") as f:
        meta = pickle.load(f)
    step = meta["step"]
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckpt_dir = os.path.join(path, f"step_{step}")
        try:
            state = ckptr.restore(ckpt_dir, item=jax.device_get(template))
        except Exception:
            # structure mismatch — try the legacy-layout migration
            raw = ckptr.restore(ckpt_dir)
            state = _migrate_legacy(raw, jax.device_get(template))
    else:  # pragma: no cover
        with open(os.path.join(path, f"step_{step}.pkl"), "rb") as f:
            state = pickle.load(f)
    return state, step, meta.get("rng_state")


def save_artifact(path: str, name: str, array):
    """Reference-style output artifact (images_{it} etc.) as .npy."""
    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, f"{name}.npy"), np.asarray(array))


def save_pytree_artifact(path: str, name: str, tree: Any):
    """Pytree artifact (e.g. hallucinator params — hal_{it}.pt in the
    reference, distill_s2d_ms.py:175-193) as an .npz of path-keyed leaves."""
    os.makedirs(path, exist_ok=True)
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[jax.tree_util.keystr(kp)] = np.asarray(leaf)
    np.savez(os.path.join(path, f"{name}.npz"), **flat)


def load_pytree_artifact(path_npz: str, template: Any):
    """Inverse of save_pytree_artifact: restore leaves into the template's
    structure (leaf order follows tree_flatten_with_path, keyed by path)."""
    with np.load(path_npz) as z:
        paths, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = [z[jax.tree_util.keystr(kp)] for kp, _ in paths]
    return jax.tree_util.tree_unflatten(treedef, leaves)
