import os

import jax
import jax.numpy as jnp

from cvpr22_cross_modal_pseudo_labeling_tpu.utils.profiler import (
    device_memory_stats,
    profile_steps,
    trace,
)


def test_trace_writes_files(tmp_path):
    logdir = str(tmp_path / "trace")
    f = jax.jit(lambda x: x * 2 + 1)
    with trace(logdir):
        jax.block_until_ready(f(jnp.ones((128, 128))))
    # the profiler writes a plugins/profile subtree
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, "no trace files written"


def test_profile_steps(tmp_path):
    def step(state, batch):
        return state + 1, {"loss": jnp.sum(batch["x"]) * state}

    state, logdir = profile_steps(
        jax.jit(step),
        jnp.zeros(()),
        {"x": jnp.ones((8, 8))},
        n_steps=2,
        logdir=str(tmp_path / "t"),
    )
    assert float(state) == 3.0  # 1 warmup + 2 profiled


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    # CPU backends may not expose memory stats; the call must not fail
    assert isinstance(stats, dict)
