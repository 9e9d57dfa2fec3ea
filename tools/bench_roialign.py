#!/usr/bin/env python
"""On-chip micro-benchmark of roi_align_mxu einsum orderings.

The two contractions can disagree on preferred layouts, making XLA
insert a pure transpose copy of the [s,H,Q,C] intermediate (~10ms per
chunk at C4 scale).  This times fwd and fwd+bwd for several algebraic
orderings at the benchmark shapes to pick the layout-friendliest one.

Usage: python tools/bench_roialign.py
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    B, H, W, C = 8, 50, 84, 1024
    S, P, Q = 256, 14, 14  # one roi chunk
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(B, H, W, C), jnp.bfloat16)
    a_y = jnp.asarray(rng.rand(B, S, P, H), jnp.bfloat16)
    a_x = jnp.asarray(rng.rand(B, S, Q, W), jnp.bfloat16)

    def v_shqc(f, ay, ax):
        tmp = jnp.einsum("bsqw,bhwc->bshqc", ax, f,
                         preferred_element_type=jnp.float32
                         ).astype(jnp.bfloat16)
        return jnp.einsum("bsph,bshqc->bspqc", ay, tmp,
                          preferred_element_type=jnp.float32)

    def v_sqhc(f, ay, ax):
        tmp = jnp.einsum("bsqw,bhwc->bsqhc", ax, f,
                         preferred_element_type=jnp.float32
                         ).astype(jnp.bfloat16)
        return jnp.einsum("bsph,bsqhc->bspqc", ay, tmp,
                          preferred_element_type=jnp.float32)

    def v_triple(f, ay, ax):
        return jnp.einsum("bsph,bhwc,bsqw->bspqc", ay, f, ax,
                          preferred_element_type=jnp.float32)

    def v_spwc(f, ay, ax):
        tmp = jnp.einsum("bsph,bhwc->bspwc", ay, f,
                         preferred_element_type=jnp.float32
                         ).astype(jnp.bfloat16)
        return jnp.einsum("bspwc,bsqw->bspqc", tmp, ax,
                          preferred_element_type=jnp.float32)

    def v_hsqc(f, ay, ax):
        tmp = jnp.einsum("bsqw,bhwc->bhsqc", ax, f,
                         preferred_element_type=jnp.float32
                         ).astype(jnp.bfloat16)
        return jnp.einsum("bsph,bhsqc->bspqc", ay, tmp,
                          preferred_element_type=jnp.float32)

    def timed(fn, *args, n=10):
        r = fn(*args)
        float(jnp.sum(r[0]) if isinstance(r, tuple) else jnp.sum(r))
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        float(jnp.sum(r[0]) if isinstance(r, tuple) else jnp.sum(r))
        return (time.perf_counter() - t0) / n * 1e3

    for name, fn in [
        ("shqc", v_shqc), ("sqhc", v_sqhc), ("hsqc", v_hsqc),
        ("triple", v_triple), ("spwc", v_spwc),
    ]:
        fwd = jax.jit(fn)

        def loss(f, ay, ax, fn=fn):
            return jnp.sum(fn(f, ay, ax).astype(jnp.float32))

        gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        t_f = timed(fwd, feat, a_y, a_x)
        t_g = timed(gr, feat, a_y, a_x)
        print(f"{name:8s} fwd {t_f:7.2f} ms   grad {t_g:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
