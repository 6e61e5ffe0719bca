"""Profiling hooks — jax.profiler traces + phase timers.

The reference has no profiler integration (SURVEY.md §5); iters/sec is the
north-star metric, so tracing is first-class here.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


def timed(fn, *args, sync: bool = True, **kwargs):
    """(result, seconds); blocks on device completion for honest timing."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    if sync:
        jax.block_until_ready(out)
    return out, time.perf_counter() - t0
