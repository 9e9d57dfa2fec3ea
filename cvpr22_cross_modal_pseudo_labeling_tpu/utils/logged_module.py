"""Opt-in per-tensor debug statistics.

Re-design of reference utils/logged_module.py:16-38 (LoggedModule) for
a functional stack: ``log_stats`` computes (min/max/mean/std/nan-count)
under jit via jax.debug.callback; ``check_finite`` raises on NaN/Inf
like the reference's _log_raise_nan + the MMSS forward NaN guard
(mmss_gcnn.py:116-120).
"""

from typing import Dict

import jax
import jax.numpy as jnp


def tensor_stats(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    xf = x.astype(jnp.float32)
    return {
        "min": jnp.min(xf),
        "max": jnp.max(xf),
        "mean": jnp.mean(xf),
        "std": jnp.std(xf),
        "nans": jnp.sum(~jnp.isfinite(xf)),
    }


def log_stats(name: str, x: jnp.ndarray, enabled: bool = True):
    """Prints tensor stats from inside a jitted function."""
    if not enabled:
        return
    stats = tensor_stats(x)

    def cb(s):
        print(
            f"[{name}] min={s['min']:.4g} max={s['max']:.4g} "
            f"mean={s['mean']:.4g} std={s['std']:.4g} nans={int(s['nans'])}"
        )

    jax.debug.callback(cb, stats)


def check_finite(tree, message: str = "non-finite value detected"):
    """Host-side guard: raises ValueError when any leaf has NaN/Inf
    (call on device_get results — the trainer uses it on loss dicts)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            raise ValueError(f"{message}: {jax.tree_util.keystr(path)}")
