"""Persistent-compile-cache helper (utils/compile_cache.py), wired
into both CLIs and the driver entry points so repeat invocations skip
the multi-minute XLA compile."""

import os

import jax
import jax.numpy as jnp
import pytest

from cvpr22_cross_modal_pseudo_labeling_tpu.utils.compile_cache import (
    enable_compile_cache,
)


@pytest.fixture
def restore_cache_config(monkeypatch):
    """Saves/restores the process-wide jax compilation-cache config so
    these tests never leave the cache pointed at a deleted tmp dir —
    or redirected to the real ~/.jax_cache — for later tests."""
    prior = {
        name: jax.config._read(name)
        for name in (
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_entry_size_bytes",
            "jax_persistent_cache_min_compile_time_secs",
        )
    }
    monkeypatch.delenv("CMPL_TPU_COMPILE_CACHE_DIR", raising=False)
    yield
    for name, value in prior.items():
        jax.config.update(name, value)


def test_enable_compile_cache_populates_dir(
    tmp_path, monkeypatch, restore_cache_config
):
    cache = str(tmp_path / "xla_cache")
    assert enable_compile_cache(cache) == cache
    # sub-second programs are intentionally below the 0.5 s floor;
    # drop it for the probe program so the write is observable
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # a fresh program (unique constant) must land in the cache dir
    out = jax.jit(lambda x: x * 3.25 + 17.0)(jnp.arange(8.0))
    assert float(out[1]) == 3.25 + 17.0
    assert os.listdir(cache), "no cache entry written"

    # explicit opt-out resolves to disabled
    monkeypatch.setenv("CMPL_TPU_COMPILE_CACHE_DIR", "off")
    assert enable_compile_cache() == ""


def test_env_var_resolution(tmp_path, monkeypatch, restore_cache_config):
    cache = str(tmp_path / "from_env")
    monkeypatch.setenv("CMPL_TPU_COMPILE_CACHE_DIR", cache)
    assert enable_compile_cache() == cache
    assert os.path.isdir(cache)
