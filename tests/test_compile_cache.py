"""Persistent-compile-cache helper (utils/compile_cache.py), wired
into both CLIs and the driver entry points so repeat invocations skip
the multi-minute XLA compile."""

import os

import jax
import jax.numpy as jnp

from cvpr22_cross_modal_pseudo_labeling_tpu.utils.compile_cache import (
    enable_compile_cache,
)


def test_enable_compile_cache_populates_dir(tmp_path, monkeypatch):
    cache = str(tmp_path / "xla_cache")
    assert enable_compile_cache(cache) == cache
    try:
        # a fresh program (unique constant) must land in the cache dir
        out = jax.jit(lambda x: x * 3.25 + 17.0)(jnp.arange(8.0))
        assert float(out[1]) == 3.25 + 17.0
        assert os.listdir(cache), "no cache entry written"

        # explicit opt-out resolves to disabled
        monkeypatch.setenv("CMPL_TPU_COMPILE_CACHE_DIR", "off")
        assert enable_compile_cache() == ""
    finally:
        # restore the session default so later tests in this process
        # don't write into the (deleted) tmp dir
        monkeypatch.delenv("CMPL_TPU_COMPILE_CACHE_DIR", raising=False)
        enable_compile_cache()


def test_env_var_resolution(tmp_path, monkeypatch):
    cache = str(tmp_path / "from_env")
    monkeypatch.setenv("CMPL_TPU_COMPILE_CACHE_DIR", cache)
    try:
        assert enable_compile_cache() == cache
        assert os.path.isdir(cache)
    finally:
        monkeypatch.delenv("CMPL_TPU_COMPILE_CACHE_DIR", raising=False)
        enable_compile_cache()
