"""Per-executable XLA compile-option defaults for the hot jits.

XLA_FLAGS set in the client env do not reliably reach the remote (axon)
compiler; per-executable ``compiler_options`` ride the compile request,
so the distillation step builders pass ``tpu_compiler_options()`` to
their ``jax.jit`` calls.

Measured (scripts/ab_xla_sched.py, r5, flagship S2D-MTT step at the
miniUCF101 ipc=1 shape): raising the scoped-VMEM fusion ceiling from
the ~16 MiB default to 64 MiB is worth +2.8% (1.2265 -> 1.2606
steps/s) — the reverse-over-forward backward's fusions are VMEM-capped.
The latency-hiding scheduler was noise (+0.2%) and
``xla_exec_time_optimization_effort`` predates this libtpu's option
parser ("No such compile option").
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax

_ENV = "VD_SCOPED_VMEM_KIB"
_DEFAULT_KIB = "65536"


def tpu_compiler_options() -> Optional[Dict[str, str]]:
    """Compile-option overrides for the current backend, or None.

    TPU-only: CPU/GPU PJRT reject unknown ``xla_tpu_*`` options with
    INVALID_ARGUMENT, so anything but a TPU backend gets None (the
    8-device virtual CPU test mesh included). Set ``VD_SCOPED_VMEM_KIB``
    to tune, or to the empty string to disable entirely.
    """
    kib = os.environ.get(_ENV, _DEFAULT_KIB)
    if not kib:
        return None
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return None
    if backend != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": kib}
