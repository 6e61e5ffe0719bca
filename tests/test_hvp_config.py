"""bf16-HVP configuration: default island resolution, stage-name
validation, and the feat-path dtype boundary (ADVICE r4 + VERDICT r4
ask #2 — the landed head-island default).

The overflow itself only reproduces at flagship shapes on the TPU; the
flagship-shape finiteness regression is the VD_TPU_TESTS-gated test at
the bottom (scripts/bisect_bf16_hvp.py is the measurement harness; the
committed 50-step evidence is in BASELINE.md round-5).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_resolve_hvp_config_defaults(monkeypatch):
    from video_distillation_tpu.distill.mtt import resolve_hvp_config

    # absent env -> bf16 HVP with the validated fp32 head island
    monkeypatch.delenv("VD_HVP_DTYPE", raising=False)
    monkeypatch.delenv("VD_HVP_FP32_STAGES", raising=False)
    dt, stages = resolve_hvp_config()
    assert dt == jnp.bfloat16
    assert stages == ("head",)

    # blanket-fp32 escape hatch (the r4 default)
    monkeypatch.setenv("VD_HVP_DTYPE", "float32")
    dt, _ = resolve_hvp_config()
    assert dt == jnp.float32

    # stages PRESENT but empty -> island-free (the bisection baseline);
    # this is distinct from absent
    monkeypatch.setenv("VD_HVP_DTYPE", "bfloat16")
    monkeypatch.setenv("VD_HVP_FP32_STAGES", "")
    dt, stages = resolve_hvp_config()
    assert dt == jnp.bfloat16
    assert stages == ()

    monkeypatch.setenv("VD_HVP_FP32_STAGES", "s2,head")
    _, stages = resolve_hvp_config()
    assert stages == ("s2", "head")


def test_fp32_stages_rejects_unknown_names():
    from video_distillation_tpu.models.layers import fp32_stages

    with pytest.raises(ValueError, match="unknown fp32 island"):
        fp32_stages(("s4",))
    with pytest.raises(ValueError, match="unknown fp32 island"):
        fp32_stages(("Head",))  # case-sensitive
    # valid names construct fine
    with fp32_stages(("s1", "head")):
        pass


def test_feat_output_stays_compute_dtype_under_island():
    """With 's3' islanded the feat return used to leak fp32 to embed
    consumers (DM mean-matching) — the boundary cast now restores the
    compute dtype (ADVICE r4)."""
    from video_distillation_tpu.models import layers
    from video_distillation_tpu.models.convnet3d import ConvNet3D

    model = ConvNet3D(num_classes=4, frames=8, im_size=(64, 64))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 64, 64, 3))
    k = jax.random.PRNGKey(1)
    params = model.init({"params": k, "dropout": k}, x,
                        train=False)["params"]
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    xb = x.astype(jnp.bfloat16)
    with layers.fp32_stages(("s3",)):
        feat = model.apply({"params": pb}, xb, train=False, output="feat")
    assert feat.dtype == jnp.bfloat16


@pytest.mark.slow
@pytest.mark.tpu
@pytest.mark.skipif(os.environ.get("VD_TPU_TESTS") != "1",
                    reason="needs the tunneled TPU (set VD_TPU_TESTS=1)")
def test_flagship_bf16_hvp_head_island_finite_tpu():
    """Regression at the failing flagship shape (112^2 x 16,
    syn_steps=10): the default bf16 HVP + fp32 head island must produce
    finite outer grads. Runs in a fresh subprocess on the axon TPU
    (tests/conftest.py forces CPU in-process; CPU cannot compile this
    shape in test-budget time)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the ambient default is the TPU
    env["VD_HVP_DTYPE"] = "bfloat16"
    env["VD_HVP_FP32_STAGES"] = "head"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bisect_bf16_hvp.py"),
         "--mode", "child", "--hvp_dtype", "bfloat16", "--stages", "head",
         "--syn_steps", "10", "--steps", "3"],
        capture_output=True, text=True, timeout=3600, env=env, cwd=REPO)
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("RESULT ")]
    assert line, f"no RESULT line:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    import json
    rec = json.loads(line[-1][len("RESULT "):])
    assert all(rec["finite"]), rec
