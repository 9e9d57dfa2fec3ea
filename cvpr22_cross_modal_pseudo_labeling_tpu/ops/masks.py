"""Mask resampling ops: device-side crop/resize and host-side pasting.

The reference moves masks between coordinate frames in three places, all
via CPU loops:
  * mask target projection — GT masks cropped to proposal boxes at 28x28
    (reference: maskrcnn_benchmark/modeling/roi_heads/mask_head/loss.py:11-42,
    flagged "FIXME: CPU computation bottleneck");
  * teacher pseudo-mask pasting — Masker pastes 28x28 teacher masks into
    the image frame (modeling/detector/st_generalized_rcnn.py:264-272);
  * eval pasting — Masker again, before RLE encoding
    (data/datasets/evaluation/coco/coco_eval.py:108-146).

TPU design: the train-step paths never materialize [R, H, W] image-frame
masks.  ``crop_resize_from_box_frame`` resamples a mask defined on one
box's frame directly onto another box's 28x28 grid, fusing the
paste->crop roundtrip of the pseudo-label pipeline into one bilinear
gather.  Host-side eval pasting (``paste_masks_np``) reproduces the
Masker numerics (inference.py:96-165) in numpy for COCOeval.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _axis_tap_matrix(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """[N] float sample positions -> [N, size] two-tap bilinear weight
    rows (align_corners=False boundary rules: out-of-range taps
    contribute zero, indices clamp; the gather-formulation golden
    reference lives in tests/test_ops_misc.py::_sample_bilinear_golden).
    Lets the resample run as matmuls
    instead of gathers — at train-step scale the gather formulation
    cost ~23ms/step in XLA's custom gather fusions."""
    i0 = jnp.floor(coords).astype(jnp.int32)
    l = coords - i0
    w0 = jnp.where((i0 >= 0) & (i0 <= size - 1), 1.0 - l, 0.0)
    w1 = jnp.where((i0 + 1 >= 0) & (i0 + 1 <= size - 1), l, 0.0)
    i0c = jnp.clip(i0, 0, size - 1)
    i1c = jnp.clip(i0 + 1, 0, size - 1)
    pos = jnp.arange(size)[None, :]
    return (
        w0[:, None] * (pos == i0c[:, None])
        + w1[:, None] * (pos == i1c[:, None])
    )


def crop_resize_from_box_frame(
    src_mask: jnp.ndarray,
    src_box: jnp.ndarray,
    dst_box: jnp.ndarray,
    out_size: Tuple[int, int],
) -> jnp.ndarray:
    """Resamples ``src_mask`` [M, M], defined over ``src_box`` (xyxy, image
    pixels), onto an out_size grid over ``dst_box``.

    Grid convention follows torch ``interpolate(align_corners=False)``:
    mask pixel (i + 0.5) / M spans the box extent (w = x2 - x1 + 1, the
    legacy +1, per paste_mask_in_image inference.py:131-141).

    Computed as the separable matmul W_y @ mask @ W_x^T (gather-free;
    identical numerics — each output pixel is the same two-tap-per-axis
    sum, zeros elsewhere).
    """
    oh, ow = out_size
    m_h, m_w = src_mask.shape
    src_w = src_box[2] - src_box[0] + 1.0
    src_h = src_box[3] - src_box[1] + 1.0
    dst_w = dst_box[2] - dst_box[0] + 1.0
    dst_h = dst_box[3] - dst_box[1] + 1.0

    # centers of dst pixels in image coords
    ys_img = dst_box[1] + (jnp.arange(oh) + 0.5) * dst_h / oh
    xs_img = dst_box[0] + (jnp.arange(ow) + 0.5) * dst_w / ow
    # map into src mask pixel coords (continuous), then to sample coords
    ys = (ys_img - src_box[1]) / src_h * m_h - 0.5
    xs = (xs_img - src_box[0]) / src_w * m_w - 0.5
    w_y = _axis_tap_matrix(ys, m_h)  # [oh, m_h]
    w_x = jnp.transpose(_axis_tap_matrix(xs, m_w))  # [m_w, ow]
    return w_y @ src_mask.astype(w_y.dtype) @ w_x


crop_resize_from_box_frame_batch = jax.vmap(
    crop_resize_from_box_frame, in_axes=(0, 0, 0, None)
)


def project_masks_on_boxes(
    gt_masks: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    proposal_boxes: jnp.ndarray,
    matched_idx: jnp.ndarray,
    out_size: int,
) -> jnp.ndarray:
    """Device-side replacement for project_masks_on_boxes
    (mask_head/loss.py:11-42): for each proposal, crop its matched GT
    instance mask to the proposal box and resize to out_size.

    Args:
      gt_masks: [G, M, M] per-instance masks rasterized over each
        instance's own gt box (host pipeline provides these).
      gt_boxes: [G, 4] the boxes those masks are defined over.
      proposal_boxes: [S, 4].
      matched_idx: [S] int32 into G.
      out_size: output resolution (28 in the shipped configs).

    Returns [S, out_size, out_size] float targets in [0, 1].
    """
    src_masks = gt_masks[matched_idx]
    src_boxes = gt_boxes[matched_idx]
    return crop_resize_from_box_frame_batch(
        src_masks, src_boxes, proposal_boxes, (out_size, out_size)
    )


# ---------------------------------------------------------------------------
# Host-side pasting for eval (numpy; mirrors Masker)
# ---------------------------------------------------------------------------

def paste_mask_box_local(
    mask_probs: np.ndarray,
    box: np.ndarray,
    image_hw: Tuple[int, int],
    threshold: float = 0.5,
    padding: int = 1,
):
    """One mask's Masker math (mask_head/inference.py:96-218) WITHOUT
    the full-image canvas: pad the M x M probs by 1, expand the box by
    the matching scale, bilinear-resize (align_corners=False) to the
    (+1 convention) box size, threshold, clip to the image.

    Returns (binarized [h, w] uint8, x0, y0) — the image-frame placement
    of the clipped crop — or None when the box is fully outside."""
    im_h, im_w = image_hw
    m = mask_probs.shape[-1]
    scale = float(m + 2 * padding) / m
    mask = np.zeros((m + 2 * padding, m + 2 * padding), np.float32)
    # explicit end index: `[padding:-padding]` is the EMPTY slice when
    # padding == 0 (a valid Masker setting), silently zeroing every mask
    mask[padding:padding + m, padding:padding + m] = mask_probs

    box = np.asarray(box, np.float32)
    w_half = (box[2] - box[0]) * 0.5 * scale
    h_half = (box[3] - box[1]) * 0.5 * scale
    x_c = (box[2] + box[0]) * 0.5
    y_c = (box[3] + box[1]) * 0.5
    ebox = np.array(
        [x_c - w_half, y_c - h_half, x_c + w_half, y_c + h_half]
    ).astype(np.int32)

    w = max(int(ebox[2] - ebox[0] + 1), 1)
    h = max(int(ebox[3] - ebox[1] + 1), 1)

    try:
        # cv2 INTER_LINEAR uses the same align_corners=False half-pixel
        # mapping as F.interpolate; SIMD beats the numpy path ~10x
        import cv2

        resized = cv2.resize(mask, (w, h), interpolation=cv2.INTER_LINEAR)
    except ImportError:
        ys = (np.arange(h) + 0.5) * mask.shape[0] / h - 0.5
        xs = (np.arange(w) + 0.5) * mask.shape[1] / w - 0.5
        y0 = np.floor(ys).astype(np.int32)
        x0 = np.floor(xs).astype(np.int32)
        ly = (ys - y0).astype(np.float32)
        lx = (xs - x0).astype(np.float32)
        y0c, y1c = np.clip(y0, 0, mask.shape[0] - 1), np.clip(
            y0 + 1, 0, mask.shape[0] - 1
        )
        x0c, x1c = np.clip(x0, 0, mask.shape[1] - 1), np.clip(
            x0 + 1, 0, mask.shape[1] - 1
        )
        # separable two-pass: rows [h, M+2] then columns [h, w]
        rows = mask[y0c] * (1 - ly)[:, None] + mask[y1c] * ly[:, None]
        resized = rows[:, x0c] * (1 - lx) + rows[:, x1c] * lx
    binarized = (resized > threshold).astype(np.uint8)

    x_0 = max(int(ebox[0]), 0)
    x_1 = min(int(ebox[2]) + 1, im_w)
    y_0 = max(int(ebox[1]), 0)
    y_1 = min(int(ebox[3]) + 1, im_h)
    if x_1 <= x_0 or y_1 <= y_0:
        return None
    crop = binarized[
        (y_0 - ebox[1]) : (y_1 - ebox[1]), (x_0 - ebox[0]) : (x_1 - ebox[0])
    ]
    return crop, x_0, y_0


def paste_masks_np(
    masks: np.ndarray,
    boxes: np.ndarray,
    image_hw: Tuple[int, int],
    threshold: float = 0.5,
    padding: int = 1,
) -> np.ndarray:
    """Numpy re-derivation of Masker (mask_head/inference.py:96-218).

    Args: masks [R, M, M] probabilities; boxes [R, 4] xyxy.
    Returns [R, H, W] uint8.  The eval path should prefer
    utils.rle.encode_pasted_mask, which skips this canvas entirely.
    """
    im_h, im_w = image_hw
    out = np.zeros((masks.shape[0], im_h, im_w), np.uint8)
    for i in range(masks.shape[0]):
        res = paste_mask_box_local(
            masks[i], boxes[i], image_hw, threshold, padding
        )
        if res is None:
            continue
        crop, x_0, y_0 = res
        out[i, y_0 : y_0 + crop.shape[0], x_0 : x_0 + crop.shape[1]] = crop
    return out
