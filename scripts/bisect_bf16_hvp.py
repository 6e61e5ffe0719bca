"""Localize the bf16 second-order overflow (VERDICT r3 ask #2).

At flagship shapes (112^2 x 16, syn_steps=10, the sweep config at 1e-2
LRs) the fully-bf16 reverse-over-forward HVP produces inf/nan outer
grads on the FIRST step; fp32 is clean and cotangent scaling does not
help (v-scale-independent) — i.e. a masked inf / 0*inf in ONE bf16
intermediate (BASELINE.md postmortem). mtt.py currently pays a blanket
fp32 HVP. This script finds the guilty op so the island can shrink.

Modes (run on the TPU; CPU cannot compile these shapes in reasonable
time):

* ``--ab``: build the S2D-MTT step at the failing config under each
  VD_HVP_DTYPE in {float32, bfloat16}, run 3 steps, report grad
  finiteness + honest per-step wall time (host fetch). This is also the
  measurement of what the blanket fp32 HVP costs.
* ``--locate``: enable jax_debug_nans and run the bf16-HVP step — JAX
  re-executes op-by-op on the first non-finite output and raises with
  the primitive + traceback, naming the guilty intermediate.

NOTE: VD_HVP_DTYPE is read at mtt.py import, and _build_* are
lru_cached — each dtype runs in a fresh subprocess.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(hvp_dtype: str, locate: bool, steps: int, small: bool,
            syn_steps_override: int = 0, stages: str = ""):
    os.environ["VD_HVP_DTYPE"] = hvp_dtype
    # unconditional: an empty value must CLEAR any ambient island left
    # in the shell from a prior experiment (ADVICE r4)
    os.environ["VD_HVP_FP32_STAGES"] = stages
    import jax

    from video_distillation_tpu.parallel.mesh import ensure_platform_env

    ensure_platform_env()
    if locate:
        jax.config.update("jax_debug_nans", True)

    import jax.numpy as jnp
    import numpy as np

    from video_distillation_tpu.distill.mtt import (_build_s2d_mtt_step,
                                                    flat_param_template,
                                                    make_batch_plan)
    from video_distillation_tpu.distill.s2d import S2DConfig, init_s2d_state

    if small:
        C, frames, im, syn_steps = 4, 8, (64, 64), 2
    else:  # the failing flagship config (sweep_s2d_mtt grid, 1e-2 LRs)
        C, frames, im, syn_steps = 10, 16, (112, 112), 10
    if syn_steps_override:
        syn_steps = syn_steps_override
    s2d_cfg = S2DConfig(num_classes=C, spc=2, dpc=2, vpc=1, n_hal=1,
                        frames=frames, im_size=im)
    state = init_s2d_state(jax.random.PRNGKey(0), s2d_cfg)
    # real-scale statics (normalized-space ~N(0,1)) — zero-init hides
    # the overflow
    state["static"] = jax.random.normal(jax.random.PRNGKey(1),
                                        state["static"].shape, jnp.float32)
    s2d_items = tuple(sorted(dataclasses.asdict(s2d_cfg).items()))
    step_fn = _build_s2d_mtt_step(
        "ConvNet3D", 3, C, im, frames, syn_steps=syn_steps,
        s2d_items=s2d_items, lr_static=100.0, lr_dynamic=1e-2,
        lr_hal=1e-2, lr_lr=1e-5, train_static=False, train_lr=True,
        compute_dtype="bfloat16")

    _, _, flat, _ = flat_param_template("ConvNet3D", 3, C, im, frames)
    # expert segment: theta_target = a second random init direction —
    # matches the magnitude regime of a 1-epoch segment
    th0 = jnp.asarray(flat)
    _, _, flat1, _ = flat_param_template("ConvNet3D", 3, C, im, frames,
                                         seed=1)
    th1 = jnp.asarray(0.9 * flat + 0.1 * flat1)

    rng = np.random.default_rng(0)
    moms = jax.tree.map(jnp.zeros_like, state)
    syn_lr = jnp.asarray(0.01)
    mom_lr = jnp.zeros(())
    n_syn = C * s2d_cfg.vpc

    print(f"[config] hvp_dtype={hvp_dtype} syn_steps={syn_steps} "
          f"stages={stages!r} shapes={im}x{frames} C={C}", flush=True)
    times, finite = [], []
    for it in range(steps):
        plan = jnp.asarray(make_batch_plan(rng, n_syn, n_syn, syn_steps))
        t0 = time.time()
        out = step_fn(jax.random.fold_in(jax.random.PRNGKey(2), it),
                      state, syn_lr, moms, mom_lr, th0, th1, plan)
        state, syn_lr, moms, mom_lr = out[:4]
        loss = float(out[4])  # honest sync: host fetch
        dyn_ok = bool(jnp.isfinite(state["dynamic"]).all())
        lr_ok = bool(jnp.isfinite(syn_lr))
        times.append(time.time() - t0)
        finite.append(bool(dyn_ok and lr_ok and np.isfinite(loss)))
        print(f"[{hvp_dtype}] it={it} loss={loss:.5f} "
              f"dyn_finite={dyn_ok} lr_finite={lr_ok} "
              f"wall={times[-1]:.2f}s", flush=True)
    rec = {"hvp_dtype": hvp_dtype, "finite": finite,
           "syn_steps": syn_steps, "stages": stages,
           "steady_wall_s": round(min(times[1:] or times), 3)}
    print("RESULT " + json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("ab", "locate", "child"),
                    default="ab")
    ap.add_argument("--hvp_dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--small", action="store_true",
                    help="64^2x8 shapes (CPU-compilable smoke test; the "
                         "overflow only reproduces at flagship shapes)")
    ap.add_argument("--syn_steps", type=int, default=0,
                    help="override syn_steps (minimal-repro search; "
                         "combine with VD_MTT_UNROLL=1 so --locate names "
                         "the primitive instead of 'nan in scan')")
    ap.add_argument("--stages", default="",
                    help="comma list of fp32-island stages for a bf16 "
                         "HVP (s1,s2,s3,head) — VD_HVP_FP32_STAGES")
    args = ap.parse_args()

    if args.mode == "child":
        run_one(args.hvp_dtype, locate=False, steps=args.steps,
                small=args.small, syn_steps_override=args.syn_steps,
                stages=args.stages)
        return
    if args.mode == "locate":
        run_one(args.hvp_dtype, locate=True, steps=1, small=args.small,
                syn_steps_override=args.syn_steps, stages=args.stages)
        return
    # A/B: fresh subprocess per dtype (env read at import, lru caches)
    for dt in ("float32", "bfloat16"):
        cmd = [sys.executable, os.path.abspath(__file__), "--mode",
               "child", "--hvp_dtype", dt, "--steps", str(args.steps),
               "--syn_steps", str(args.syn_steps),
               "--stages", args.stages]
        if args.small:
            cmd.append("--small")
        print(f"=== VD_HVP_DTYPE={dt} ===", flush=True)
        subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()
