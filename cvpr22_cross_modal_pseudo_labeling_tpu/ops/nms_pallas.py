"""Pallas TPU kernel for exact greedy NMS.

The XLA formulation (ops/nms.py) runs the tiled greedy algorithm as a
fori_loop whose per-tile IoU matrices round-trip through HBM between
steps.  This kernel keeps the entire working set — boxes, suppression
state, per-tile IoU — in VMEM and resolves the whole sequential
suppression chain in ONE kernel launch:

  for each score-ordered tile t:
      alive_t &= no kept box in earlier tiles overlaps > thr
      keep_t  = fixpoint of keep[i] = alive[i] & !any(keep[j<i] & over[j,i])

Data is laid out tile-major ([T, tile, ...]) because Mosaic lowers
dynamic indexing on leading (sublane) dimensions but not 1-D dynamic
vector loads; the per-tile working matrices are [tile, tile] (256 x 256
f32 = 256 KB), so VMEM use is bounded regardless of N.

Suppression is strict > threshold with the legacy +1 IoU, matching
csrc/cuda/nms.cu.  The public entry matches ops/nms.nms (sorting +
compaction happen in XLA around the kernel).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pair_iou(ax1, ay1, ax2, ay2, a_area, bx1, by1, bx2, by2, b_area):
    """IoU between row boxes a[...] and col boxes b[...]: broadcasts the
    trailing dims; legacy +1 convention."""
    ix1 = jnp.maximum(ax1[..., None], bx1[None, :])
    iy1 = jnp.maximum(ay1[..., None], by1[None, :])
    ix2 = jnp.minimum(ax2[..., None], bx2[None, :])
    iy2 = jnp.minimum(ay2[..., None], by2[None, :])
    iw = jnp.maximum(ix2 - ix1 + 1.0, 0.0)
    ih = jnp.maximum(iy2 - iy1 + 1.0, 0.0)
    inter = iw * ih
    return inter / jnp.maximum(
        a_area[..., None] + b_area[None, :] - inter, 1e-10
    )


def _nms_kernel(boxes_ref, alive_ref, labels_ref, keep_ref, *, tile: int,
                iou_threshold: float):
    num_tiles = boxes_ref.shape[0]

    keep_ref[:] = jnp.zeros((num_tiles, tile), jnp.float32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    tri = (row_ids < col_ids).astype(jnp.float32)  # j < i strictly

    def coords(tb):
        tx1, ty1, tx2, ty2 = tb[:, 0], tb[:, 1], tb[:, 2], tb[:, 3]
        area = (tx2 - tx1 + 1.0) * (ty2 - ty1 + 1.0)
        return tx1, ty1, tx2, ty2, area

    def tile_body(t, _):
        tb = boxes_ref[t]  # [tile, 4]
        tx1, ty1, tx2, ty2, t_area = coords(tb)
        t_alive = alive_ref[t]
        t_labels = labels_ref[t]

        # cross suppression by kept boxes of earlier tiles (same label
        # only — class-agnostic callers pass all-zero labels)
        def cross_body(j, sup):
            jb = boxes_ref[j]
            jx1, jy1, jx2, jy2, j_area = coords(jb)
            iou = _pair_iou(
                jx1, jy1, jx2, jy2, j_area, tx1, ty1, tx2, ty2, t_area
            )  # [tile(j), tile(t)]
            same = (labels_ref[j][:, None] == t_labels[None, :]).astype(
                jnp.float32
            )
            keep_j = keep_ref[j]
            s = jnp.max(
                keep_j[:, None]
                * (iou > iou_threshold).astype(jnp.float32)
                * same,
                axis=0,
            )
            return jnp.maximum(sup, s)

        suppressed = jax.lax.fori_loop(
            0, t, cross_body, jnp.zeros((tile,), jnp.float32)
        )
        t_alive = t_alive * (1.0 - suppressed)

        # in-tile greedy via fixpoint of the keep recurrence
        siou = _pair_iou(
            tx1, ty1, tx2, ty2, t_area, tx1, ty1, tx2, ty2, t_area
        )
        over = (
            (siou > iou_threshold).astype(jnp.float32)
            * tri
            * (t_labels[:, None] == t_labels[None, :]).astype(jnp.float32)
        )

        def fix_cond(state):
            return state[1]

        def fix_body(state):
            keep_t, _ = state
            sup_i = jnp.minimum(
                jnp.max(keep_t[:, None] * over, axis=0), 1.0
            )
            new = t_alive * (1.0 - sup_i)
            return new, jnp.any(new != keep_t)

        keep_t, _ = jax.lax.while_loop(fix_cond, fix_body, (t_alive, True))
        keep_ref[t] = keep_t
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "max_outputs", "tile", "interpret"),
)
def nms_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    tile: int = 256,
    interpret: bool = False,
    labels: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in equivalent of ops.nms.nms (including per-class
    suppression via ``labels``) with the suppression loop in a single
    Pallas kernel.  Class-agnostic calls run with an all-zero label
    vector, which the same-label gate reduces to plain NMS."""
    n = boxes.shape[0]
    n_pad = ((n + tile - 1) // tile) * tile
    pad = n_pad - n
    num_tiles = n_pad // tile
    boxes_p = jnp.pad(boxes.astype(jnp.float32), ((0, pad), (0, 0)))
    scores_p = jnp.pad(scores.astype(jnp.float32), (0, pad))
    valid_p = jnp.pad(valid, (0, pad))
    if labels is None:
        labels_p = jnp.zeros((n_pad,), jnp.int32)
    else:
        labels_p = jnp.pad(labels.astype(jnp.int32), (0, pad))

    key = jnp.where(valid_p, scores_p, -jnp.inf)
    order = jnp.argsort(-key)
    sboxes = boxes_p[order].reshape(num_tiles, tile, 4)
    salive = valid_p[order].astype(jnp.float32).reshape(num_tiles, tile)
    slabels = labels_p[order].reshape(num_tiles, tile)

    keep = pl.pallas_call(
        functools.partial(
            _nms_kernel, tile=tile, iou_threshold=iou_threshold
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, tile), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sboxes, salive, slabels)

    kept = keep.reshape(n_pad) > 0.5
    sel = jnp.where(kept, jnp.arange(n_pad), n_pad)
    k = min(max_outputs, n_pad)
    first = jnp.argsort(sel)[:k]
    out_idx = order[first].astype(jnp.int32)
    out_valid = kept[first]
    out_idx = jnp.where(out_valid, out_idx, 0)
    if k < max_outputs:
        # keep the documented static [max_outputs] shape even when the
        # padded input is smaller than the requested capacity
        out_idx = jnp.pad(out_idx, (0, max_outputs - k))
        out_valid = jnp.pad(out_valid, (0, max_outputs - k))
    return out_idx, out_valid
