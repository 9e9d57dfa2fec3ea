"""Statically-shaped box containers and geometry ops.

TPU-native replacement for the reference's dynamic ``BoxList``
(reference: maskrcnn_benchmark/structures/bounding_box.py:9-255 and
structures/boxlist_ops.py:9-129).  All arrays are padded to a static
capacity ``P`` and carry a boolean ``valid`` mask; every op is pure jnp and
``vmap``-able over a leading batch dimension.

The legacy Detectron "+1" pixel convention (``TO_REMOVE = 1`` in
bounding_box.py:67, boxlist_ops.py:83-88) is preserved exactly — box
width = x2 - x1 + 1 — because AP parity depends on it.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp

TO_REMOVE = 1.0


@flax.struct.dataclass
class Boxes:
    """Padded boxes in xyxy convention plus arbitrary per-box fields.

    Attributes:
      xyxy:  [..., P, 4] float boxes (x1, y1, x2, y2).
      valid: [..., P] bool mask; padding slots are False.
      fields: dict of per-box arrays (scores, labels, embeddings, 28x28
        mask logits, ...), each shaped [..., P, *]; replaces BoxList's
        ``extra_fields``.  String fields of the reference (``caption``,
        ``is_det``) live host-side in batch metadata, never on device.
    """

    xyxy: jnp.ndarray
    valid: jnp.ndarray
    fields: Dict[str, jnp.ndarray] = flax.struct.field(default_factory=dict)

    @property
    def capacity(self) -> int:
        return self.xyxy.shape[-2]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def get_field(self, name: str) -> jnp.ndarray:
        return self.fields[name]

    def has_field(self, name: str) -> bool:
        return name in self.fields

    def with_fields(self, **kw: jnp.ndarray) -> "Boxes":
        new = dict(self.fields)
        new.update(kw)
        return self.replace(fields=new)

    def copy_with_fields(self, names) -> "Boxes":
        # Mirrors BoxList.copy_with_fields (bounding_box.py:240-251).
        return Boxes(self.xyxy, self.valid, {n: self.fields[n] for n in names})


def pad_boxes(
    xyxy: jnp.ndarray,
    capacity: int,
    fields: Optional[Dict[str, jnp.ndarray]] = None,
) -> Boxes:
    """Pads [N,4] host boxes to a static capacity with a validity mask."""
    n = xyxy.shape[0]
    assert n <= capacity, f"{n} boxes exceed capacity {capacity}"
    pad = [(0, capacity - n), (0, 0)]
    out_fields = {}
    if fields:
        for k, v in fields.items():
            fpad = [(0, capacity - n)] + [(0, 0)] * (v.ndim - 1)
            out_fields[k] = jnp.pad(v, fpad)
    valid = jnp.arange(capacity) < n
    return Boxes(jnp.pad(xyxy, pad), valid, out_fields)


# ---------------------------------------------------------------------------
# Geometry (all pure functions over raw [..., 4] arrays)
# ---------------------------------------------------------------------------

def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area under the legacy +1 convention (bounding_box.py:230-235)."""
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU [M, N] between a [M,4] and b [N,4].

    Matches boxlist_iou (boxlist_ops.py:53-88) including the +1 term.

    Written per-coordinate (no stacked [M,N,2] intermediate): inside an
    NMS tile loop the stacked form forced XLA to materialize a
    [batch,N,tile,2] f32 tensor to HBM every iteration (~400MB at RPN
    scale); per-coordinate scalars fuse into the consuming reduction.
    """
    area_a = box_area(a)  # [M]
    area_b = box_area(b)  # [N]
    x1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    y1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    x2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    w = jnp.clip(x2 - x1 + TO_REMOVE, 0.0)
    h = jnp.clip(y2 - y1 + TO_REMOVE, 0.0)
    inter = w * h
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-10)


def clip_to_image(boxes: jnp.ndarray, image_size: jnp.ndarray) -> jnp.ndarray:
    """Clips xyxy boxes to [0, size-1] (BoxList.clip_to_image,
    bounding_box.py:215-222).  ``image_size`` is (h, w)."""
    h = image_size[..., 0].astype(boxes.dtype)
    w = image_size[..., 1].astype(boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0.0, w[..., None] - TO_REMOVE)
    y1 = jnp.clip(boxes[..., 1], 0.0, h[..., None] - TO_REMOVE)
    x2 = jnp.clip(boxes[..., 2], 0.0, w[..., None] - TO_REMOVE)
    y2 = jnp.clip(boxes[..., 3], 0.0, h[..., None] - TO_REMOVE)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty_mask(boxes: jnp.ndarray, min_size: float = 0.0) -> jnp.ndarray:
    """remove_small_boxes as a mask (boxlist_ops.py:33-50): keeps boxes
    whose xywh width and height are both >= min_size."""
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return (w >= min_size) & (h >= min_size)


def flip_horizontal(boxes: jnp.ndarray, image_width: jnp.ndarray) -> jnp.ndarray:
    """BoxList.transpose(FLIP_LEFT_RIGHT) (bounding_box.py:176-198)."""
    x1 = image_width - boxes[..., 2] - TO_REMOVE
    x2 = image_width - boxes[..., 0] - TO_REMOVE
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """BoxList.convert('xywh') (bounding_box.py:62-79)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [x1, y1, x2 - x1 + TO_REMOVE, y2 - y1 + TO_REMOVE], axis=-1
    )


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [x, y, x + w - TO_REMOVE, y + h - TO_REMOVE], axis=-1
    )


def resize_boxes(boxes: jnp.ndarray, scale_xy) -> jnp.ndarray:
    """BoxList.resize for uniform or (sx, sy) scaling (bounding_box.py:140-174)."""
    sx, sy = scale_xy
    return boxes * jnp.stack(
        [jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(sx), jnp.asarray(sy)]
    ).astype(boxes.dtype)


def concat_boxes(a: Boxes, b: Boxes) -> Boxes:
    """cat_boxlist (boxlist_ops.py:103-129) for padded Boxes: concatenates
    along the capacity axis; fields present in both are concatenated,
    others dropped."""
    shared = [k for k in a.fields if k in b.fields]
    # Fields are shaped [..., P, *trailing]; the capacity axis is the last
    # axis of `valid` (== valid.ndim - 1).
    cap_axis = a.valid.ndim - 1
    fields = {
        k: jnp.concatenate([a.fields[k], b.fields[k]], axis=cap_axis)
        for k in shared
    }
    return Boxes(
        jnp.concatenate([a.xyxy, b.xyxy], axis=-2),
        jnp.concatenate([a.valid, b.valid], axis=-1),
        fields,
    )


def compact_topk(boxes: Boxes, k: int, score_field: str = "scores") -> Boxes:
    """Selects the k highest-scoring valid boxes into a fresh padded
    container (invalid slots pushed to the end).  The static-shape
    replacement for BoxList boolean indexing."""
    scores = boxes.fields.get(score_field)
    if scores is None:
        scores = jnp.zeros(boxes.valid.shape, jnp.float32)
    keyed = jnp.where(boxes.valid, scores, -jnp.inf)
    _, idx = jax.lax.top_k(keyed, k)
    take = lambda arr: jnp.take_along_axis(
        arr, idx.reshape(idx.shape + (1,) * (arr.ndim - idx.ndim)), axis=idx.ndim - 1
    ) if arr.ndim > idx.ndim else jnp.take_along_axis(arr, idx, axis=idx.ndim - 1)
    new_valid = jnp.take_along_axis(boxes.valid, idx, axis=idx.ndim - 1)
    return Boxes(
        take(boxes.xyxy),
        new_valid,
        {k2: take(v) for k2, v in boxes.fields.items()},
    )
