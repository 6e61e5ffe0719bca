"""conv2 dgrad emitter probe (VERDICT r4 ask #3 — diagnosis-driven).

The r5 full-graph trace (BASELINE.md round-5) shows the conv2 family
(k=7x7 s=2, (800,28,28,64)->(800,14,14,128), /root/reference/
networks.py:799) costs ~304 ms of the 810 ms device step, and the
DGRAD direction is the pathology: ~149 ms at ~50 TF/s ~= peak/4, while
fwd (~128 TF/s) and wgrad (~112 TF/s) are healthy. peak/4 is exactly
the signature of XLA zero-stuffing the stride-2 transposed conv
(lhs_dilation=2 -> 4x MACs on zeros) instead of phase-decomposing it.

This probe times, in one jitted data-dependent chain each (CLAUDE.md:
single-op microbenches lie; a chained loop with data dependence is the
minimum honest isolated measurement — the DECISION still comes from the
full-graph A/B in scripts/ab_kernels.py):

* native   — jax.linear_transpose of the stride-2 conv (exactly the
             dgrad XLA emits in the real graph)
* phase    — the 4-parity decomposition: ONE stride-1 4x4 conv over the
             (1,2)-padded cotangent with a (4,4,O,4*C) zero-slotted
             kernel, then depth-to-space. 1.31x tap inflation, full
             lane occupancy, no lhs dilation.

Also numerically checks phase == native (fp32, small shape) first.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def phase_dgrad_kernel(w, dtype):
    """(7,7,C,O) fwd kernel -> (4,4,O,4*C) phase-dgrad kernel.

    Row parity a of the input grid uses fwd taps u = (a+3) - 2*t with
    window t in {-1,0,1,2}; as a VALID conv over the (1,2)-padded
    cotangent with 4 taps m (t = m-1): k_a[m] = w[a+5-2m] (zero when out
    of range). Same for columns. Output channel layout: (a, b, c) ->
    ((a*2 + b)*C + c), matching a (14,14,2,2,C) depth-to-space.
    """
    import jax.numpy as jnp

    kh, kw, C, O = w.shape
    assert (kh, kw) == (7, 7)
    k = jnp.zeros((4, 4, O, 4 * C), dtype)
    for a in range(2):
        for b in range(2):
            for m in range(4):
                u = a + 5 - 2 * m
                if not (0 <= u < 7):
                    continue
                for n in range(4):
                    v = b + 5 - 2 * n
                    if not (0 <= v < 7):
                        continue
                    # transpose: contract over O, emit C
                    k = k.at[m, n, :, (a * 2 + b) * C:
                             (a * 2 + b) * C + C].set(
                        w[u, v].astype(dtype).T)
    return k


def phase_dgrad(cot, kphase, C):
    """cot (B,14,14,O) -> x_bar (B,28,28,C) via one stride-1 conv."""
    import jax
    import jax.numpy as jnp

    B, Ho, Wo, O = cot.shape
    cp = jnp.pad(cot, ((0, 0), (1, 2), (1, 2), (0, 0)))
    y = jax.lax.conv_general_dilated(
        cp, kphase, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (B,14,14,4C)
    # depth-to-space (2,2): channel block (a,b,c)
    y = y.reshape(B, Ho, Wo, 2, 2, C)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, 2 * Ho, 2 * Wo, C)


def native_fwd(x, w):
    import jax

    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def check_correct():
    import jax
    import jax.numpy as jnp

    kx = jax.random.PRNGKey(0)
    x = jax.random.normal(kx, (2, 28, 28, 5), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 5, 9), jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(2), (2, 14, 14, 9),
                            jnp.float32)
    lt = jax.linear_transpose(lambda xx: native_fwd(xx, w), x)
    ref = lt(cot)[0]
    got = phase_dgrad(cot, phase_dgrad_kernel(w, jnp.float32), 5)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"phase-dgrad max |err| vs linear_transpose: {err:.3e}")
    assert err < 1e-3, err
    return True


def bench(variant: str, iters: int, dtype_str: str):
    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    B, C, O = 800, 64, 128
    w = (jax.random.normal(jax.random.PRNGKey(1), (7, 7, C, O),
                           jnp.float32) * 0.05).astype(dt)
    cot0 = jax.random.normal(jax.random.PRNGKey(2), (B, 14, 14, O),
                             jnp.float32).astype(dt)
    proj = (jax.random.normal(jax.random.PRNGKey(3), (C, O), jnp.float32)
            * 0.05).astype(dt)
    x_shape = jax.ShapeDtypeStruct((B, 28, 28, C), dt)
    kphase = phase_dgrad_kernel(w, dt)

    @jax.jit
    def chain(cot):
        def body(cot, _):
            if variant == "native":
                xbar = jax.linear_transpose(
                    lambda xx: native_fwd(xx, w), x_shape)(cot)[0]
            else:
                xbar = phase_dgrad(cot, kphase, C)
            # data dependence: subsample back to cotangent shape (cheap)
            nxt = xbar[:, ::2, ::2, :] @ proj
            nxt = nxt / (jnp.max(jnp.abs(nxt)) + 1e-3)
            return nxt.astype(dt), ()

        out, _ = jax.lax.scan(body, cot, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    s = float(chain(cot0))  # compile + run
    t0 = time.perf_counter()
    s = float(chain(cot0))
    dtime = time.perf_counter() - t0
    gf = 800 * 14 * 14 * 49 * C * O * 2 / 1e9  # useful dgrad GF
    print(f"[{variant} {dtype_str}] {iters} chained dgrads in {dtime:.3f}s"
          f" -> {dtime / iters * 1e3:.2f} ms each, useful "
          f"{gf / (dtime / iters) / 1e3:.1f} TF/s (sum={s:.3e})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--skip_check", action="store_true")
    args = ap.parse_args()
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from video_distillation_tpu.parallel.mesh import ensure_platform_env
    ensure_platform_env()
    if not args.skip_check:
        check_correct()
    for variant in ("native", "phase"):
        bench(variant, args.iters, args.dtype)


if __name__ == "__main__":
    main()
