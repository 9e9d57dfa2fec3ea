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


# bf16 peak FLOP/s by TPU generation (MXU roofline; the MFU
# denominator).  One table for every bench — updating the peak or the
# cost_analysis unwrap quirk happens here, not per bench script.
TPU_PEAK_BF16_FLOPS = {
    "v4": 275e12,
    "v5 lite": 197e12,  # device_kind string for v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v6 lite": 918e12,
    "v6e": 918e12,
}


def tpu_peak_flops(device=None) -> float:
    """Peak bf16 FLOP/s of ``device`` (default: first jax device),
    keyed on device_kind; falls back to v5e when unrecognized."""
    d = device if device is not None else jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for gen, peak in TPU_PEAK_BF16_FLOPS.items():
        if gen in kind:
            return peak
    return TPU_PEAK_BF16_FLOPS["v5e"]


def compiled_step_flops(jitted_fn, *args) -> float:
    """HLO flop count of ``jitted_fn(*args)`` from XLA's cost analysis
    (0.0 when the backend reports none).  Handles the list/tuple
    unwrap quirk of older jax versions."""
    cost = jitted_fn.lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0)) if cost else 0.0


def mfu_metrics(flops_per_step: float, sec_per_step: float) -> Dict[str, float]:
    """``{tflops_per_sec, mfu_pct}`` for one compiled step — achieved
    FLOP rate over the running device's bf16 peak."""
    achieved = flops_per_step / sec_per_step
    return {
        "tflops_per_sec": round(achieved / 1e12, 2),
        "mfu_pct": round(100.0 * achieved / tpu_peak_flops(), 2),
    }


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
