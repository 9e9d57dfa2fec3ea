"""Exact greedy NMS with static shapes, designed for TPU.

Replaces the reference CUDA bitmask kernel
(reference: maskrcnn_benchmark/csrc/cuda/nms.cu:23-131 and
csrc/cpu/nms_cpu.cpp) with a tiled formulation: boxes are sorted by
score, processed in score-ordered tiles; each tile is first suppressed by
all previously-kept boxes (one [N, T] IoU contraction — MXU/VPU work, no
host loop), then resolved internally by iterating the greedy recurrence
``keep[i] = alive[i] and not any(keep[j] and iou[j, i] > t for j < i)``
to its (unique) fixpoint.  The fixpoint equals the sequential greedy
solution; convergence takes at most the suppression-chain depth
(typically 2-4 iterations), so sequential steps are O(N / tile) instead
of O(N).

IoU uses the legacy +1 convention, matching the reference kernel.
Suppression is strict: iou > threshold (nms.cu devIoU comparison).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.boxes import box_iou


def _pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return box_iou(a, b)


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "max_outputs", "tile")
)
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    tile: int = 256,
    labels: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over padded boxes.

    Args:
      boxes: [N, 4] xyxy.
      scores: [N].
      valid: [N] bool; invalid slots never suppress and are never kept.
      iou_threshold: suppress when IoU > threshold.
      max_outputs: static output capacity.
      tile: score-ordered tile size (sequential steps = N / tile).
      labels: optional [N] int; when given, suppression only applies
        between boxes of the same label (per-class NMS fused into the
        IoU reduce — unshifted coordinates keep full f32 precision at
        open-vocab class counts, unlike the coordinate-offset trick).

    Returns:
      (indices [max_outputs] int32 into the input, keep_valid
      [max_outputs] bool).  Kept boxes appear in descending score order.
    """
    n = boxes.shape[0]
    n_pad = ((n + tile - 1) // tile) * tile
    pad = n_pad - n
    boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
    scores = jnp.pad(scores, (0, pad))
    valid = jnp.pad(valid, (0, pad))

    key = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-key)  # stable descending
    sboxes = boxes[order]
    svalid = valid[order]
    slabels = None
    if labels is not None:
        slabels = jnp.pad(labels.astype(jnp.int32), (0, pad))[order]

    num_tiles = n_pad // tile
    tri = jnp.tril(jnp.ones((tile, tile), bool), k=-1).T  # over[j, i], j < i

    def outer(i, kept):
        start = i * tile
        tboxes = jax.lax.dynamic_slice(sboxes, (start, 0), (tile, 4))
        talive = jax.lax.dynamic_slice(svalid, (start,), (tile,))

        # Cross-tile suppression by everything already kept.
        iou_cross = _pairwise_iou(sboxes, tboxes)  # [n_pad, tile]
        over_cross = iou_cross > iou_threshold
        if slabels is not None:
            tlabels = jax.lax.dynamic_slice(slabels, (start,), (tile,))
            over_cross &= slabels[:, None] == tlabels[None, :]
        suppressed = jnp.any(kept[:, None] & over_cross, axis=0)
        talive = talive & ~suppressed

        # In-tile greedy via fixpoint iteration of the keep recurrence.
        iou_self = _pairwise_iou(tboxes, tboxes)
        over = (iou_self > iou_threshold) & tri
        if slabels is not None:
            over &= tlabels[:, None] == tlabels[None, :]

        def body(state):
            keep, _ = state
            new = talive & ~jnp.any(keep[:, None] & over, axis=0)
            return new, jnp.any(new != keep)

        def cond(state):
            return state[1]

        keep_t, _ = jax.lax.while_loop(
            cond, body, (talive, jnp.asarray(True))
        )
        return jax.lax.dynamic_update_slice(kept, keep_t, (start,))

    kept = jax.lax.fori_loop(
        0, num_tiles, outer, jnp.zeros((n_pad,), bool)
    )

    # Compact: first max_outputs kept slots in score order.
    sel = jnp.where(kept, jnp.arange(n_pad), n_pad)
    k = min(max_outputs, n_pad)
    first = jnp.argsort(sel)[:k]
    out_idx = order[first].astype(jnp.int32)
    out_valid = kept[first]
    # Map any padded index back into range for safe downstream gathers.
    out_idx = jnp.where(out_valid, out_idx, 0)
    if k < max_outputs:
        # keep the documented static [max_outputs] shape even when the
        # padded input is smaller than the requested capacity
        out_idx = jnp.pad(out_idx, (0, max_outputs - k))
        out_valid = jnp.pad(out_valid, (0, max_outputs - k))
    return out_idx, out_valid


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    tile: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-class NMS as one fused pass.

    The reference loops per-class NMS in Python
    (roi_heads/box_head/inference.py:119-144) — a 1203-iteration loop at
    open-vocabulary eval.  Fusing a same-label mask into the suppression
    reduce makes one NMS pass equivalent.  (An earlier coordinate-offset
    formulation lost f32 precision at offsets ~1.6e6 for 1203 classes x
    1333px images, where box resolution is 0.125px — IoUs near the
    threshold could flip for small boxes.)
    """
    return nms(
        boxes,
        scores,
        valid,
        iou_threshold,
        max_outputs,
        tile,
        labels=labels,
    )
