"""RoIAlign as batched matmuls (MXU formulation) — the TPU-native hot
path.

Key observation: RoIAlign's average over the adaptive bilinear sample
grid (reference csrc/cpu/ROIAlign_cpu.cpp:16-180) is **separable**.
For one roi,

  out[p, q, c] = (1 / (g_h g_w)) * sum_{iy, ix} bilinear(F, y_{p,iy}, x_{q,ix})[c]
              = sum_h sum_w  A_y[p, h] * A_x[w, q] * F[h, w, c]

because each bilinear tap weight factorizes into a y-part and an x-part
and the sample positions form an outer product of per-axis grids.  With

  A_y[p, h] = (1/g_h) * sum_iy (taps of y_{p,iy} hitting row h)
  A_x[w, q] = (1/g_w) * sum_ix (taps of x_{q,ix} hitting col w)

RoIAlign becomes two dense contractions per image:

  tmp = einsum('sph,hwc->spwc', A_y, F)     # MXU
  out = einsum('spwc,swq->spqc', tmp, A_x)  # MXU

— no gathers at all (TPUs have no gather unit; XLA lowers gathers to
serial dynamic-slices), features are read once per image, and the math
is bit-equivalent to the sampled formulation up to float summation
order.  Throughput is flops-bound at ~150 MFLOP/roi for the C4 shapes
instead of ~26 GB of HBM gather traffic per step.

This is the default pooler path; ops/roi_align.py (gather formulation)
remains the golden reference and handles exotic shapes.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .roi_align import _bilinear_weights


def _axis_interp_matrix(
    start: jnp.ndarray,
    bin_size: jnp.ndarray,
    grid: jnp.ndarray,
    size: int,
    bins: int,
    s_cap: int,
    bin_stride: int = 1,
) -> jnp.ndarray:
    """Builds A [R, ceil(bins/bin_stride), size]: accumulated bilinear
    tap weights per output bin over input positions, averaged over the
    per-roi sample grid.  Boundary rules match ROIAlign_cpu.cpp:44-92.

    ``bin_stride`` > 1 computes only every bin_stride-th bin (same bin
    geometry): when the consumer is a stride-s conv whose first tap is
    1x1 (stride_in_1x1 C5 heads), the skipped bins are exactly the
    positions that conv would discard, so pooling them is wasted work.
    """
    r = start.shape[0]
    dtype = start.dtype
    p_idx = jnp.arange(0, bins, bin_stride, dtype=dtype)[None, :]
    pos_iota = jnp.arange(size)[None, None, :]  # [1, 1, size]

    a = jnp.zeros((r, p_idx.shape[1], size), dtype)
    g = grid[:, None].astype(dtype)  # [R, 1]
    for i in range(s_cap):
        coord = (
            start[:, None]
            + p_idx * bin_size[:, None]
            + (i + 0.5) * bin_size[:, None] / g
        )  # [R, bins]
        # shared Caffe2 boundary rules — roi_align.py is the golden
        # reference for these numerics; do not re-inline them here
        lo, hi, w_lo, w_hi, in_range = _bilinear_weights(coord, size)
        valid = (in_range & (i < grid[:, None])).astype(dtype)
        w_lo = w_lo * valid  # [R, bins]
        w_hi = w_hi * valid
        onehot_lo = (pos_iota == lo[:, :, None]).astype(dtype)
        onehot_hi = (pos_iota == hi[:, :, None]).astype(dtype)
        a = a + w_lo[:, :, None] * onehot_lo + w_hi[:, :, None] * onehot_hi
    return a / g[:, :, None]


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_size", "spatial_scale", "sampling_ratio", "max_samples",
        "roi_chunk", "bin_stride",
    ),
)
def roi_align_mxu(
    features: jnp.ndarray,
    rois_per_image: jnp.ndarray,
    output_size: Tuple[int, int],
    spatial_scale: float,
    sampling_ratio: int = 0,
    max_samples: int = 8,
    roi_chunk: int = 128,
    bin_stride: int = 1,
) -> jnp.ndarray:
    """features [B, H, W, C]; rois_per_image [B, S, 4] xyxy (image-frame
    coordinates, roi i of image b pools from features[b]).

    Returns [B, S, ceil(P/bin_stride), ceil(Q/bin_stride), C];
    bin_stride keeps the output_size bin geometry but emits only every
    bin_stride-th bin on each axis (see _axis_interp_matrix).
    """
    P, Q = output_size
    B, H, W, C = features.shape
    S = rois_per_image.shape[1]
    dtype = jnp.float32

    rois = rois_per_image.astype(dtype)
    start_w = rois[..., 0] * spatial_scale
    start_h = rois[..., 1] * spatial_scale
    end_w = rois[..., 2] * spatial_scale
    end_h = rois[..., 3] * spatial_scale
    roi_w = jnp.maximum(end_w - start_w, 1.0)
    roi_h = jnp.maximum(end_h - start_h, 1.0)
    bin_w = roi_w / Q
    bin_h = roi_h / P

    if sampling_ratio > 0:
        grid_h = jnp.full((B, S), sampling_ratio, jnp.int32)
        grid_w = jnp.full((B, S), sampling_ratio, jnp.int32)
        s_cap_h = s_cap_w = sampling_ratio
    else:
        s_cap_h = min(max_samples, -(-H // P))
        s_cap_w = min(max_samples, -(-W // Q))
        grid_h = jnp.clip(jnp.ceil(roi_h / P).astype(jnp.int32), 1, s_cap_h)
        grid_w = jnp.clip(jnp.ceil(roi_w / Q).astype(jnp.int32), 1, s_cap_w)

    compute_dtype = features.dtype

    out_p = -(-P // bin_stride)
    out_q = -(-Q // bin_stride)

    def per_image(feat, s_h, s_w, b_h, b_w, g_h, g_w):
        def chunk_fn(args):
            sh, sw, bh, bw, gh, gw = args
            a_y = _axis_interp_matrix(
                sh, bh, gh, H, P, s_cap_h, bin_stride
            )
            a_x = _axis_interp_matrix(
                sw, bw, gw, W, Q, s_cap_w, bin_stride
            )
            a_y = a_y.astype(compute_dtype)
            a_x = a_x.astype(compute_dtype)
            # Contraction order picks the smaller materialized
            # intermediate ([s,P,W,C] vs [s,H,Q,C]) — the chain is
            # HBM-bound, so intermediate bytes dominate, not FLOPs.
            if H * out_q <= out_p * W:
                # [s, Q, W] x [H, W, C] -> [s, Q, H, C]
                # (sqhc ordering: both dots agree on layout — shqc/hsqc
                # made XLA insert a ~10ms transpose copy of the
                # intermediate per chunk; measured in
                # tools/bench_roialign.py: sqhc 20.5/26.2ms fwd/grad vs
                # shqc 30.9/39.0 at C4 bench shapes)
                tmp = jnp.einsum(
                    "sqw,hwc->sqhc", a_x, feat,
                    preferred_element_type=jnp.float32,
                ).astype(compute_dtype)
                # [s, P, H] x [s, Q, H, C] -> [s, P, Q, C]
                out = jnp.einsum(
                    "sph,sqhc->spqc", a_y, tmp,
                    preferred_element_type=jnp.float32,
                )
            else:
                # [s, P, H] x [H, W, C] -> [s, P, W, C]
                tmp = jnp.einsum(
                    "sph,hwc->spwc", a_y, feat,
                    preferred_element_type=jnp.float32,
                ).astype(compute_dtype)
                # [s, P, W, C] x [s, Q, W] -> [s, P, Q, C]
                out = jnp.einsum(
                    "spwc,sqw->spqc", tmp, a_x,
                    preferred_element_type=jnp.float32,
                )
            return out.astype(compute_dtype)

        n_chunks = -(-S // roi_chunk)
        if n_chunks == 1:
            # single chunk: call directly — the length-1 lax.map would
            # still stage a scan whose dynamic-update-slice copies cost
            # several ms/step at C4 bench shapes
            return chunk_fn((s_h, s_w, b_h, b_w, g_h, g_w))
        pad = n_chunks * roi_chunk - S
        # pad with benign values: zero grid/bin sizes would produce
        # inf/NaN that poison gradients through the slice (NaN * 0 = NaN)
        padded = [
            jnp.pad(v, ((0, pad),), constant_values=1)
            for v in (s_h, s_w, b_h, b_w, g_h, g_w)
        ]
        shaped = [
            v.reshape(n_chunks, roi_chunk, *v.shape[1:]) for v in padded
        ]
        out = jax.lax.map(chunk_fn, tuple(shaped))
        return out.reshape(n_chunks * roi_chunk, out_p, out_q, C)[:S]

    return jax.vmap(per_image)(
        features, start_h, start_w, bin_h, bin_w, grid_h, grid_w
    )
