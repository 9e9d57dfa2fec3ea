#!/usr/bin/env python
"""Prototype: fused Pallas RoIAlign-as-matmuls forward kernel.

Computes out[b,s,p,q,c] = sum_{h,w} Ay[b,s,p,h] * F[b,h,w,c] * Ax[b,s,q,w]
without materializing the [b,s,*,h|w,c] intermediate in HBM (the XLA
two-einsum path writes+reads ~3GB per roi chunk at C4 bench shapes).

Strategies for the second (per-roi, small-M) contraction are tried in
interpret mode first, then lowered on the attached TPU and timed against
the XLA einsum reference.

Usage:
  python tools/proto_pallas_roialign.py interpret   # CPU correctness
  python tools/proto_pallas_roialign.py tpu         # lowering + timing
"""

import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

INTERPRET = len(sys.argv) > 1 and sys.argv[1] == "interpret"

if INTERPRET:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if INTERPRET:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fwd_kernel(ax_ref, ay_ref, f_ref, out_ref, t_ref, *, H, SB, P, Q, CB):
    # e1: t[s,h,q,cb] = sum_w ax[s,q,w] * f[h,w,cb]; h unrolled so each
    # step is one 2-D MXU dot with M = SB*Q.
    ax = ax_ref[0].reshape(SB * Q, -1)  # [SB*Q, W]
    for h in range(H):
        f_h = f_ref[0, h]  # [W, CB]
        t_h = jnp.dot(ax, f_h, preferred_element_type=jnp.float32)
        t_ref[:, h] = t_h.reshape(SB, Q, CB).astype(t_ref.dtype)
    # e2: out[s,p,q,cb] = sum_h ay[s,p,h] * t[s,h,q,cb] — batched over
    # s; let Mosaic lower the rank-4 einsum (falls back to a loop
    # variant below if unsupported).
    ay = ay_ref[0]  # [SB, P, H]
    t = t_ref[:]  # [SB, H, Q, CB]
    out = jax.lax.dot_general(
        ay, t,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [SB, P, Q, CB]
    out_ref[0] = out.astype(out_ref.dtype)


def fwd_kernel_sloop(ax_ref, ay_ref, f_ref, out_ref, t_ref, *, H, SB, P, Q, CB):
    ax = ax_ref[0].reshape(SB * Q, -1)
    for h in range(H):
        f_h = f_ref[0, h]
        t_h = jnp.dot(ax, f_h, preferred_element_type=jnp.float32)
        t_ref[:, h] = t_h.reshape(SB, Q, CB).astype(t_ref.dtype)

    def body(s, _):
        ay_s = ay_ref[0, s]  # [P, H]
        t_s = t_ref[s]  # [H, Q, CB]
        o = jax.lax.dot_general(
            ay_s, t_s,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [P, Q, CB]
        out_ref[0, s] = o.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, SB, body, 0)


def fwd_kernel_bigdot(ax_ref, ay_ref, ft_ref, out_ref, t_ref, *,
                      H, SB, P, Q, CB, unroll_s):
    """e1 as ONE dot: ft is features pre-transposed to [B, W, H, C] so
    the b-operand is [W, H*CB] (lane-aligned merge, CB=128 minor).
    t scratch is [SB, Q, H, CB]; e2 contracts h per roi."""
    ax = ax_ref[0].reshape(SB * Q, -1)  # [SB*Q, W]
    ft = ft_ref[0].reshape(ft_ref.shape[1], H * CB)  # [W, H*CB]
    t = jnp.dot(ax, ft, preferred_element_type=jnp.float32)
    t_ref[:] = t.reshape(SB, Q, H, CB).astype(t_ref.dtype)

    def one(s):
        ay_s = ay_ref[0, s]  # [P, H]
        t_s = t_ref[s].reshape(Q, H, CB)
        # out_s[p, q, cb] = sum_h ay_s[p,h] * t_s[q,h,cb]
        o = jax.lax.dot_general(
            ay_s, t_s,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [P, Q, CB]
        out_ref[0, s] = o.astype(out_ref.dtype)

    if unroll_s:
        for s in range(SB):
            one(s)
    else:
        def body(s, _):
            one(s)
            return 0

        jax.lax.fori_loop(0, SB, body, 0)


def run_fused_bigdot(features, a_y, a_x, *, CB=128, SB=32,
                     t_dtype=jnp.bfloat16, unroll_s=False):
    B, H, W, C = features.shape
    S, P = a_y.shape[1:3]
    Q = a_x.shape[2]
    ft = features.transpose(0, 2, 1, 3)  # [B, W, H, C]
    grid = (B, C // CB, S // SB)
    return pl.pallas_call(
        functools.partial(
            fwd_kernel_bigdot, H=H, SB=SB, P=P, Q=Q, CB=CB,
            unroll_s=unroll_s,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, SB, Q, W), lambda b, cb, sb: (b, sb, 0, 0)),
            pl.BlockSpec((1, SB, P, H), lambda b, cb, sb: (b, sb, 0, 0)),
            pl.BlockSpec((1, W, H, CB), lambda b, cb, sb: (b, 0, 0, cb)),
        ],
        out_specs=pl.BlockSpec(
            (1, SB, P, Q, CB), lambda b, cb, sb: (b, sb, 0, 0, cb)
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, P, Q, C), features.dtype),
        scratch_shapes=[pltpu.VMEM((SB, Q, H, CB), t_dtype)],
        interpret=INTERPRET,
    )(a_x, a_y, ft)


def run_fused(features, a_y, a_x, *, CB=128, SB=32, kernel=fwd_kernel,
              t_dtype=jnp.bfloat16):
    B, H, W, C = features.shape
    S, P = a_y.shape[1:3]
    Q = a_x.shape[2]
    n_cb = C // CB
    n_sb = S // SB
    grid = (B, n_cb, n_sb)
    return pl.pallas_call(
        functools.partial(kernel, H=H, SB=SB, P=P, Q=Q, CB=CB),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, SB, Q, W), lambda b, cb, sb: (b, sb, 0, 0)),
            pl.BlockSpec((1, SB, P, H), lambda b, cb, sb: (b, sb, 0, 0)),
            pl.BlockSpec((1, H, W, CB), lambda b, cb, sb: (b, 0, 0, cb)),
        ],
        out_specs=pl.BlockSpec(
            (1, SB, P, Q, CB), lambda b, cb, sb: (b, sb, 0, 0, cb)
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, P, Q, C), features.dtype),
        scratch_shapes=[pltpu.VMEM((SB, H, Q, CB), t_dtype)],
        interpret=INTERPRET,
    )(a_x, a_y, features)


def reference(features, a_y, a_x):
    tmp = jnp.einsum(
        "bsqw,bhwc->bsqhc", a_x, features,
        preferred_element_type=jnp.float32,
    ).astype(features.dtype)
    return jnp.einsum(
        "bsph,bsqhc->bspqc", a_y, tmp,
        preferred_element_type=jnp.float32,
    ).astype(features.dtype)


def main():
    if INTERPRET:
        B, H, W, C, S, P, Q = 2, 10, 12, 256, 8, 4, 4
        CB, SB = 128, 4
    else:
        B, H, W, C, S, P, Q = 8, 50, 84, 1024, 512, 14, 14
        CB, SB = 128, 32
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(B, H, W, C), jnp.bfloat16)
    a_y = jnp.asarray(rng.rand(B, S, P, H) * 0.1, jnp.bfloat16)
    a_x = jnp.asarray(rng.rand(B, S, Q, W) * 0.1, jnp.bfloat16)

    ref = jax.jit(reference)(feat, a_y, a_x)

    variants = [
        ("bigdot_fori", functools.partial(
            run_fused_bigdot, CB=CB, SB=SB, unroll_s=False)),
        ("bigdot_unroll", functools.partial(
            run_fused_bigdot, CB=CB, SB=SB, unroll_s=True)),
        ("bigdot_sb16", functools.partial(
            run_fused_bigdot, CB=CB, SB=max(SB // 2, 1), unroll_s=True)),
        ("sloop", functools.partial(
            run_fused, CB=CB, SB=SB, kernel=fwd_kernel_sloop)),
    ]
    for name, make in variants:
        try:
            fn = jax.jit(make)
            out = fn(feat, a_y, a_x)
            err = float(
                jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32)))
            )
            rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            print(f"{name}: max_abs_err {err:.5f} rel {rel:.2e}")
            if not INTERPRET:
                float(jnp.sum(out.astype(jnp.float32)))
                t0 = time.perf_counter()
                for _ in range(10):
                    out = fn(feat, a_y, a_x)
                float(jnp.sum(out.astype(jnp.float32)))
                print(f"{name}: {(time.perf_counter()-t0)/10*1e3:.2f} ms")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")

    if not INTERPRET:
        fr = jax.jit(reference)
        float(jnp.sum(fr(feat, a_y, a_x).astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(10):
            r = fr(feat, a_y, a_x)
        float(jnp.sum(r.astype(jnp.float32)))
        print(f"xla_einsum: {(time.perf_counter()-t0)/10*1e3:.2f} ms")


if __name__ == "__main__":
    main()
