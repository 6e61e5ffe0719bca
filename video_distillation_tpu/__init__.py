"""video_distillation_tpu — a TPU-native video dataset-distillation framework.

A ground-up JAX/XLA/pjit rebuild of the capabilities of
yuz1wan/video_distillation ("Dancing with Still Images: Video Distillation
via Static-Dynamic Disentanglement", CVPR 2024):

* Distribution Matching (DM) and trajectory matching (MTT) distillation of
  video classification datasets into tiny synthetic sets.
* The paper's S2D static/dynamic-memory + hallucinator parameterization.
* Expert-trajectory buffer generation for MTT.
* FRePo kernel-ridge-regression distillation with an online model pool.
* Coreset baselines (k-center, herding).
* The reference evaluation protocol: train `num_eval` fresh nets on the
  synthetic set, report mean/std top-1 (top-5) over a 3x-repeated test pass.

Design stance (TPU-first, not a port):
* All video tensors are channels-last ``(B, F, H, W, C)`` (NDHWC) — the
  layout XLA:TPU tiles best; the reference's NCDHW appears only at
  ingestion edges.
* Training inner loops are ``lax.scan`` over steps with ``jax.checkpoint``
  rematerialisation (replacing torch ``create_graph=True`` graph retention).
* Real-data access is a packed uint8 clip store resident in HBM (or host
  RAM) with jitted gather-based sampling, replacing PIL-per-item loaders.
* Multi-device execution is a single ``jax.jit`` over a
  ``jax.sharding.Mesh`` with NamedSharding annotations (ICI collectives
  inserted by XLA), replacing ``nn.DataParallel``/``pmap``.
"""

__version__ = "0.1.0"
