"""Profiling: jax.profiler traces + simple step timers.

The reference's observability is a wall-clock Timer and max-memory logs
(reference: utils/timer.py:8-44, engine/trainer.py:150-171 — SURVEY.md 5
calls it out as minimal: no profiler, no traces).  Here:

  * ``trace(logdir)`` — context manager around jax.profiler.trace;
    produces TensorBoard/XProf traces of device execution.
  * ``profile_steps(step_fn, state, batch, ...)`` — captures a trace of
    N compiled steps (used ad hoc and by bench tooling).
  * ``device_memory_stats()`` — per-device allocation stats, the
    max_memory_allocated() equivalent.
"""

import contextlib
import os
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_steps(step_fn: Callable, state, batch, n_steps: int = 3,
                  logdir: str = "/tmp/cmpl_tpu_trace"):
    """Runs n_steps under the profiler; returns (state, trace dir)."""
    # warmup/compile outside the trace
    state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics)
    with trace(logdir):
        for _ in range(n_steps):
            state, metrics = step_fn(state, batch)
        jax.block_until_ready(metrics)
    return state, logdir


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 2**20,
                "peak_bytes_mb": stats.get("peak_bytes_in_use", 0) / 2**20,
                "bytes_limit_mb": stats.get("bytes_limit", 0) / 2**20,
            }
    return out
