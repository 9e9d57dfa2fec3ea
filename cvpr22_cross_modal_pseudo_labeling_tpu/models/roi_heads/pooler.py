"""RoI feature pooling over one or more FPN levels.

Re-design of reference modeling/poolers.py:11-133 (Pooler +
LevelMapper).  Boxes come in batched-padded form [B, S, 4]; roi tensors
[(B*S), 5] are built with batch indices (poolers.py:102-110
convert_to_roi_format).  For FPN, the LevelMapper assignment
(poolers.py:11-43, Detectron eqn (1)) selects a level per roi; each
level is pooled with all rois and combined by level mask — static
shapes, no boolean scatter.
"""

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp

from ...ops.roi_align import roi_align


def boxes_to_rois(boxes: jnp.ndarray) -> jnp.ndarray:
    """[B, S, 4] -> [B*S, 5] with leading batch index."""
    b, s, _ = boxes.shape
    batch_idx = jnp.repeat(jnp.arange(b, dtype=boxes.dtype), s)
    return jnp.concatenate(
        [batch_idx[:, None], boxes.reshape(b * s, 4)], axis=1
    )


def assign_fpn_levels(
    boxes: jnp.ndarray,
    k_min: int,
    k_max: int,
    canonical_scale: int = 224,
    canonical_level: int = 4,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LevelMapper (poolers.py:11-43): floor(k0 + log2(sqrt(area)/s0))."""
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    s = jnp.sqrt(jnp.maximum(w * h, 0.0))
    lvl = jnp.floor(
        canonical_level + jnp.log2(s / canonical_scale + eps)
    )
    return jnp.clip(lvl, k_min, k_max).astype(jnp.int32) - k_min


def pool_rois(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    output_size: Tuple[int, int],
    scales: Sequence[float],
    sampling_ratio: int,
    roi_chunk: int = 512,
    use_mxu: bool = True,
    bin_stride: int = 1,
) -> jnp.ndarray:
    """Pools [B, S, 4] boxes against one or more feature levels.

    Returns [B*S, P', Q', C] where P' = ceil(P/bin_stride).  The
    single-level hot path uses the gather-free MXU formulation
    (ops/roi_align_mxu.py); the gather formulation remains for
    multi-level FPN and as the golden path.  ``bin_stride=2`` emits
    only the even bins — exactly the positions a stride-2
    stride_in_1x1 C5 head reads (see ResNetRoIHead ``prestrided``).
    """
    if len(features) == 1 and use_mxu:
        from ...ops.roi_align_mxu import roi_align_mxu

        out = roi_align_mxu(
            features[0], boxes, output_size, scales[0], sampling_ratio,
            roi_chunk=min(roi_chunk, boxes.shape[1]),
            bin_stride=bin_stride,
        )
        b, s = boxes.shape[:2]
        return out.reshape(b * s, *out.shape[2:])
    rois = boxes_to_rois(boxes)
    if len(features) == 1:
        out = roi_align(
            features[0], rois, output_size, scales[0], sampling_ratio,
            roi_chunk=roi_chunk,
        )
        if bin_stride > 1:
            out = out[:, ::bin_stride, ::bin_stride]
        return out

    k_min = -int(round(math.log2(scales[0])))
    k_max = -int(round(math.log2(scales[-1])))
    # note: scales are 1/stride; lvl index over the provided levels
    k_lo = min(k_min, k_max)
    k_hi = max(k_min, k_max)
    levels = assign_fpn_levels(boxes.reshape(-1, 4), k_lo, k_hi)
    out = None
    for lvl, (feat, scale) in enumerate(zip(features, scales)):
        pooled = roi_align(
            feat, rois, output_size, scale, sampling_ratio,
            roi_chunk=roi_chunk,
        )
        mask = (levels == lvl).astype(pooled.dtype)[:, None, None, None]
        out = pooled * mask if out is None else out + pooled * mask
    return out
