"""RoIPool (max pooling) — parity op.

Replaces csrc/cuda/ROIPool_cuda.cu (reference:
maskrcnn_benchmark/csrc/cuda/ROIPool_cuda.cu; not used by the shipped
configs, kept for API parity with layers/roi_pool.py).  Legacy Fast
R-CNN semantics: roi coords rounded to the feature grid, +1 sizes,
integer bin edges, max over each bin.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .deform_conv import _round_half_away


@functools.partial(
    jax.jit, static_argnames=("output_size", "spatial_scale", "max_bin")
)
def roi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: Tuple[int, int],
    spatial_scale: float,
    max_bin: int = None,
) -> jnp.ndarray:
    """features [B, H, W, C]; rois [R, 5] (batch, x1, y1, x2, y2).
    Returns [R, P, Q, C].  ``max_bin`` caps the per-bin scan count; the
    scan STRIDES across the full bin (subsampled max) rather than
    truncating its head, so the pooled value always sees the whole bin.
    Default None = the exact bound ceil(H/P)+1 / ceil(W/Q)+1 (a bin can
    never be larger), reproducing the reference kernel's full-bin max."""
    P, Q = output_size
    B, H, W, C = features.shape
    dtype = features.dtype
    max_bin_h = max_bin if max_bin is not None else -(-H // P) + 1
    max_bin_w = max_bin if max_bin is not None else -(-W // Q) + 1

    batch_idx = rois[:, 0].astype(jnp.int32)
    # C round() — half away from zero; jnp.round's half-to-even would
    # shift the boundary one cell on exact .5 products (x=8, scale 1/16)
    rnd = lambda v: _round_half_away(v).astype(jnp.int32)
    x1 = rnd(rois[:, 1] * spatial_scale)
    y1 = rnd(rois[:, 2] * spatial_scale)
    x2 = rnd(rois[:, 3] * spatial_scale)
    y2 = rnd(rois[:, 4] * spatial_scale)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)
    bin_w = roi_w.astype(dtype) / Q
    bin_h = roi_h.astype(dtype) / P

    def one_roi(args):
        b, xx1, yy1, bw, bh = args
        ph = jnp.arange(P)
        pw = jnp.arange(Q)
        hstart = jnp.clip(
            jnp.floor(ph.astype(dtype) * bh).astype(jnp.int32) + yy1, 0, H
        )
        hend = jnp.clip(
            jnp.ceil((ph + 1).astype(dtype) * bh).astype(jnp.int32) + yy1, 0, H
        )
        wstart = jnp.clip(
            jnp.floor(pw.astype(dtype) * bw).astype(jnp.int32) + xx1, 0, W
        )
        wend = jnp.clip(
            jnp.ceil((pw + 1).astype(dtype) * bw).astype(jnp.int32) + xx1, 0, W
        )
        neg_inf = jnp.asarray(-jnp.inf, dtype)
        out = jnp.full((P, Q, C), neg_inf)
        fmap = features[b]
        # per-bin stride spreads the capped scan over the WHOLE bin
        # (stride 1 when the cap covers it, i.e. always at the default)
        ext_h = hend - hstart  # [P]
        ext_w = wend - wstart  # [Q]
        stride_h = jnp.maximum((ext_h + max_bin_h - 1) // max_bin_h, 1)
        stride_w = jnp.maximum((ext_w + max_bin_w - 1) // max_bin_w, 1)
        for dy in range(max_bin_h):
            off_y = dy * stride_h  # [P]
            yy = jnp.clip(hstart + off_y, 0, H - 1)  # [P]
            y_ok = off_y < ext_h
            for dx in range(max_bin_w):
                off_x = dx * stride_w  # [Q]
                xx = jnp.clip(wstart + off_x, 0, W - 1)  # [Q]
                x_ok = off_x < ext_w
                vals = fmap[yy[:, None], xx[None, :]]  # [P, Q, C]
                ok = (y_ok[:, None] & x_ok[None, :])[..., None]
                out = jnp.maximum(out, jnp.where(ok, vals, neg_inf))
        # empty bins -> 0 (reference sets maxval = 0 when bin is empty)
        return jnp.where(jnp.isfinite(out), out, 0.0)

    return jax.lax.map(one_roi, (batch_idx, x1, y1, bin_w, bin_h))
