"""Test-time bounding-box augmentation.

Re-design of reference engine/bbox_aug.py:11-131 (im_detect_bbox_aug):
run detection at multiple scales and with horizontal flip, map all
detections back to the original frame, merge, and re-run the final
score-threshold + NMS + top-k filtering once over the union.

On TPU each (scale, flip) variant is its own compiled program (static
shapes per scale bucket); the merge + final filtering runs on host
numpy + the native NMS.
"""

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.boxes import TO_REMOVE
from ..data.transforms import get_resize_hw


def flip_boxes_np(boxes: np.ndarray, width: float) -> np.ndarray:
    out = boxes.copy()
    out[:, 0] = width - boxes[:, 2] - TO_REMOVE
    out[:, 2] = width - boxes[:, 0] - TO_REMOVE
    return out


def merge_and_filter(
    all_boxes: List[np.ndarray],
    all_scores: List[np.ndarray],
    all_labels: List[np.ndarray],
    nms_thresh: float = 0.5,
    score_thresh: float = 0.05,
    detections_per_img: int = 100,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merges per-augmentation detections and applies the final filter
    (bbox_aug.py:95-131 semantics, class-wise NMS)."""
    boxes = np.concatenate(all_boxes, axis=0)
    scores = np.concatenate(all_scores, axis=0)
    labels = np.concatenate(all_labels, axis=0)
    keep = scores > score_thresh
    boxes, scores, labels = boxes[keep], scores[keep], labels[keep]

    from ..utils.native import native_nms

    out_idx: List[np.ndarray] = []
    for cls in np.unique(labels):
        sel = np.nonzero(labels == cls)[0]
        order = sel[np.argsort(-scores[sel], kind="stable")]
        kept = native_nms(boxes[order], nms_thresh, len(order))
        if kept is None:  # numpy fallback
            kept = _np_nms(boxes[order], nms_thresh)
        out_idx.append(order[kept])
    if out_idx:
        idx = np.concatenate(out_idx)
    else:
        idx = np.zeros(0, np.int64)
    if len(idx) > detections_per_img:
        idx = idx[np.argsort(-scores[idx], kind="stable")][
            :detections_per_img
        ]
    return boxes[idx], scores[idx], labels[idx]


def _np_nms(sorted_boxes: np.ndarray, thresh: float) -> np.ndarray:
    keep = []
    suppressed = np.zeros(len(sorted_boxes), bool)
    for i in range(len(sorted_boxes)):
        if suppressed[i]:
            continue
        keep.append(i)
        bi = sorted_boxes[i]
        rest = sorted_boxes[i + 1 :]
        if not len(rest):
            break
        xx1 = np.maximum(bi[0], rest[:, 0])
        yy1 = np.maximum(bi[1], rest[:, 1])
        xx2 = np.minimum(bi[2], rest[:, 2])
        yy2 = np.minimum(bi[3], rest[:, 3])
        w = np.clip(xx2 - xx1 + 1, 0, None)
        h = np.clip(yy2 - yy1 + 1, 0, None)
        inter = w * h
        ai = (bi[2] - bi[0] + 1) * (bi[3] - bi[1] + 1)
        ar = (rest[:, 2] - rest[:, 0] + 1) * (rest[:, 3] - rest[:, 1] + 1)
        iou = inter / (ai + ar - inter)
        suppressed[i + 1 :] |= iou > thresh
    return np.asarray(keep, np.int64)


def im_detect_bbox_aug(
    run_variant,
    image: np.ndarray,
    scales: Sequence[int],
    max_size: int,
    h_flip: bool,
    scale_h_flip: bool,
    base_scale: int,
    nms_thresh: float = 0.5,
    detections_per_img: int = 100,
):
    """Drives the augmentation set (bbox_aug.py:11-94).

    ``run_variant(image, hw, flipped) -> (boxes, scores, labels)`` runs
    the compiled model at a given resize target and returns original-
    frame detections.
    """
    h, w = image.shape[:2]
    variants = [(base_scale, False)]
    if h_flip:
        variants.append((base_scale, True))
    for s in scales:
        variants.append((s, False))
        if scale_h_flip:
            variants.append((s, True))

    all_b, all_s, all_l = [], [], []
    for scale, flip in variants:
        hw = get_resize_hw((h, w), scale, max_size)
        boxes, scores, labels = run_variant(image, hw, flip)
        if flip:
            boxes = flip_boxes_np(boxes, w)
        all_b.append(boxes)
        all_s.append(scores)
        all_l.append(labels)
    return merge_and_filter(
        all_b, all_s, all_l,
        nms_thresh=nms_thresh,
        detections_per_img=detections_per_img,
    )
