"""Detectron box encode/decode as pure functions.

Re-derivation of the reference BoxCoder
(reference: maskrcnn_benchmark/modeling/box_coder.py:7-95) with the exact
legacy numerics: +1 widths/heights, ``log(1000/16)`` dw/dh clip, and the
asymmetric ``-1`` on the decoded x2/y2.
"""

import math
from typing import Tuple

import jax.numpy as jnp

BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def encode_boxes(
    reference_boxes: jnp.ndarray,
    proposals: jnp.ndarray,
    weights: Tuple[float, float, float, float],
) -> jnp.ndarray:
    """Encodes gt `reference_boxes` w.r.t. `proposals`; both [..., 4] xyxy.

    Returns [..., 4] (dx, dy, dw, dh) regression targets.
    """
    wx, wy, ww, wh = weights
    ex_w = proposals[..., 2] - proposals[..., 0] + 1.0
    ex_h = proposals[..., 3] - proposals[..., 1] + 1.0
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0] + 1.0
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1] + 1.0
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    # Guard padded slots (zero-size proposals) against division blowups;
    # targets for invalid slots are masked out by callers.
    ex_w = jnp.maximum(ex_w, 1e-8)
    ex_h = jnp.maximum(ex_h, 1e-8)
    gt_w = jnp.maximum(gt_w, 1e-8)
    gt_h = jnp.maximum(gt_h, 1e-8)

    dx = wx * (gt_cx - ex_cx) / ex_w
    dy = wy * (gt_cy - ex_cy) / ex_h
    dw = ww * jnp.log(gt_w / ex_w)
    dh = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(
    rel_codes: jnp.ndarray,
    boxes: jnp.ndarray,
    weights: Tuple[float, float, float, float],
    bbox_xform_clip: float = BBOX_XFORM_CLIP,
) -> jnp.ndarray:
    """Decodes [..., K*4] codes against [..., 4] anchor/proposal boxes.

    Supports multi-class layouts where the last dim is a multiple of 4
    (box_coder.py:52-95 handles `rel_codes[:, k::4]`).
    """
    boxes = boxes.astype(rel_codes.dtype)
    widths = boxes[..., 2] - boxes[..., 0] + 1.0
    heights = boxes[..., 3] - boxes[..., 1] + 1.0
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    wx, wy, ww, wh = weights
    lead = rel_codes.shape[:-1]
    codes = rel_codes.reshape(lead + (-1, 4))
    dx = codes[..., 0] / wx
    dy = codes[..., 1] / wy
    dw = jnp.minimum(codes[..., 2] / ww, bbox_xform_clip)
    dh = jnp.minimum(codes[..., 3] / wh, bbox_xform_clip)

    pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
    pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    out = jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            # "-1 is correct; don't be fooled by the asymmetry"
            # (box_coder.py:88-91)
            pred_ctr_x + 0.5 * pred_w - 1.0,
            pred_ctr_y + 0.5 * pred_h - 1.0,
        ],
        axis=-1,
    )
    return out.reshape(rel_codes.shape)
