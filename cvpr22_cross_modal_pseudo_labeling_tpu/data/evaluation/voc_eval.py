"""VOC-style AP evaluation.

Re-implementation of the protocol behind the reference's alternative
OpenImages evaluator (reference:
data/datasets/evaluation/openimages/openimages_eval.py:14-113 +
eval_detection_voc:195) and the VOC evaluator (voc/voc_eval.py):
per-class AP at a single IoU threshold with continuous (area-under-PR)
or 11-point interpolation, with the OpenImages image-level verified
class filtering applied by the caller.
"""

from typing import Dict, List, Optional, Sequence

import numpy as np

from .coco_eval import bbox_iou_xywh


def eval_detection_voc(
    detections: List[dict],
    coco_index,
    iou_thresh: float = 0.5,
    use_07_metric: bool = False,
) -> Dict[str, float]:
    """detections: COCO-format dicts (xywh bbox).  Returns per-class AP
    and mAP."""
    cat_ids = coco_index.get_cat_ids()
    aps = {}
    for cat in cat_ids:
        # collect gt per image
        gts_by_img = {}
        n_pos = 0
        for img in coco_index.get_img_ids():
            gts = [
                g
                for g in coco_index.load_anns_for_image(img)
                if g["category_id"] == cat
            ]
            flags = [bool(g.get("iscrowd", 0)) for g in gts]
            n_pos += sum(1 for f in flags if not f)
            gts_by_img[img] = (
                np.asarray([g["bbox"] for g in gts], np.float64).reshape(
                    -1, 4
                ),
                np.asarray(flags, bool),
                np.zeros(len(gts), bool),  # matched flags
            )
        dets = sorted(
            (d for d in detections if d["category_id"] == cat),
            key=lambda d: -d["score"],
        )
        tp = np.zeros(len(dets))
        fp = np.zeros(len(dets))
        for i, d in enumerate(dets):
            entry = gts_by_img.get(d["image_id"])
            if entry is None or len(entry[0]) == 0:
                fp[i] = 1
                continue
            gt_boxes, difficult, matched = entry
            ious = bbox_iou_xywh(
                np.asarray(d["bbox"], np.float64).reshape(1, 4),
                gt_boxes,
                difficult,
            )[0]
            j = int(np.argmax(ious))
            if ious[j] >= iou_thresh:
                if difficult[j]:
                    continue  # ignore
                if not matched[j]:
                    tp[i] = 1
                    matched[j] = True
                else:
                    fp[i] = 1
            else:
                fp[i] = 1
        if n_pos == 0:
            aps[cat] = float("nan")
            continue
        tp_c = np.cumsum(tp)
        fp_c = np.cumsum(fp)
        rec = tp_c / n_pos
        prec = tp_c / np.maximum(tp_c + fp_c, 1e-10)
        if use_07_metric:
            ap = 0.0
            for t in np.arange(0.0, 1.1, 0.1):
                p = prec[rec >= t].max() if np.any(rec >= t) else 0.0
                ap += p / 11.0
        else:
            mrec = np.concatenate([[0.0], rec, [1.0]])
            mpre = np.concatenate([[0.0], prec, [0.0]])
            for k in range(len(mpre) - 1, 0, -1):
                mpre[k - 1] = max(mpre[k - 1], mpre[k])
            idx = np.nonzero(mrec[1:] != mrec[:-1])[0]
            ap = float(
                np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1])
            )
        aps[cat] = float(ap)
    valid = [v for v in aps.values() if not np.isnan(v)]
    out = {f"AP_class_{c}": v for c, v in aps.items()}
    out["mAP"] = float(np.mean(valid)) if valid else float("nan")
    return out
