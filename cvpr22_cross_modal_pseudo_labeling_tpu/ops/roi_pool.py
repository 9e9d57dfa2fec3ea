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


@functools.partial(
    jax.jit, static_argnames=("output_size", "spatial_scale", "max_bin")
)
def roi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: Tuple[int, int],
    spatial_scale: float,
    max_bin: int = 16,
) -> jnp.ndarray:
    """features [B, H, W, C]; rois [R, 5] (batch, x1, y1, x2, y2).
    Returns [R, P, Q, C].  ``max_bin`` caps the per-bin extent (masked
    max), analogous to the RoIAlign sample cap."""
    P, Q = output_size
    B, H, W, C = features.shape
    dtype = features.dtype

    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = jnp.round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    y1 = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    x2 = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    y2 = jnp.round(rois[:, 4] * spatial_scale).astype(jnp.int32)
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
        for dy in range(max_bin):
            yy = jnp.clip(hstart + dy, 0, H - 1)  # [P]
            y_ok = (hstart + dy) < hend
            for dx in range(max_bin):
                xx = jnp.clip(wstart + dx, 0, W - 1)  # [Q]
                x_ok = (wstart + dx) < wend
                vals = fmap[yy[:, None], xx[None, :]]  # [P, Q, C]
                ok = (y_ok[:, None] & x_ok[None, :])[..., None]
                out = jnp.maximum(out, jnp.where(ok, vals, neg_inf))
        # empty bins -> 0 (reference sets maxval = 0 when bin is empty)
        return jnp.where(jnp.isfinite(out), out, 0.0)

    return jax.lax.map(one_roi, (batch_idx, x1, y1, bin_w, bin_h))
