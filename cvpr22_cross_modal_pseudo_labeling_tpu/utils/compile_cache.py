"""Persistent XLA compilation cache for every entry point.

The detection train/eval graphs take minutes to compile (20-40 s on a
TPU chip, several minutes on CPU); the reference pays an analogous
CUDA-extension build once at install time (setup.py), but a torch run
has no per-process compile to amortize.  Under jit-everything XLA the
compile cost recurs per process, so every CLI (tools/train_net.py,
tools/test_net.py), the bench harness, and the driver entry points
enable jax's persistent compilation cache: compiled executables are
keyed by (HLO, compile flags, backend) and reloaded in seconds on the
next invocation — across processes and across runs.

Disable with CMPL_TPU_COMPILE_CACHE_DIR=0 (or point it elsewhere).
"""

import os


def enable_compile_cache(cache_dir: str = "") -> str:
    """Enables jax's persistent compilation cache; returns the cache
    dir ('' when disabled or unsupported).

    Resolution order: explicit ``cache_dir`` argument, the
    ``CMPL_TPU_COMPILE_CACHE_DIR`` env var, then ``~/.jax_cache`` (the
    same default bench.py warms, so CLI runs and benches share
    executables).  A value of ``0``/``off``/``none`` disables caching.
    """
    import jax

    resolved = (
        cache_dir
        or os.environ.get("CMPL_TPU_COMPILE_CACHE_DIR", "")
        or os.path.expanduser("~/.jax_cache")
    )
    if resolved.lower() in ("0", "off", "none", "false"):
        return ""
    try:
        os.makedirs(resolved, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", resolved)
        # cache aggressively: the default thresholds skip small/fast
        # programs, but eval postprocessors and tiny test configs are
        # exactly the programs re-run most often.  The 0.5 s floor keeps
        # sub-second throwaway programs (unit-test lambdas, scalar jits)
        # from accumulating — they are cheaper to recompile than to
        # store.  The cache has no eviction; prune with
        # ``find ~/.jax_cache -atime +30 -delete`` if it grows.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        return ""  # older jax or unwritable fs: compile uncached
    return resolved
