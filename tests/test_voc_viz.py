import json

import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.data.coco_index import CocoIndex
from cvpr22_cross_modal_pseudo_labeling_tpu.data.evaluation.voc_eval import (
    eval_detection_voc,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.utils.visualization import (
    denormalize_image,
    overlay_detections,
    uncertainty_heatmap,
)


def make_index(tmp_path):
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 100, "width": 100}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 1,
             "bbox": [60, 60, 20, 20], "area": 400, "iscrowd": 0},
        ],
        "categories": [{"id": 1, "name": "x"}],
    }
    p = tmp_path / "a.json"
    p.write_text(json.dumps(ann))
    return CocoIndex(str(p))


def test_voc_eval_half_recall(tmp_path):
    idx = make_index(tmp_path)
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
         "score": 0.9},
    ]
    out = eval_detection_voc(dets, idx)
    assert abs(out["mAP"] - 0.5) < 1e-6
    dets.append(
        {"image_id": 1, "category_id": 1, "bbox": [60, 60, 20, 20],
         "score": 0.8}
    )
    out = eval_detection_voc(dets, idx)
    assert abs(out["mAP"] - 1.0) < 1e-6
    # duplicate detection of a matched gt counts as FP but AP at full
    # recall stays 1.0 only if it ranks last
    out07 = eval_detection_voc(dets, idx, use_07_metric=True)
    assert out07["mAP"] > 0.9


def test_voc_eval_difficult_uses_plain_iou(tmp_path):
    """A detection INSIDE a difficult GT but with plain IoU < thresh
    must count as FP — the devkit computes plain IoU for all GTs and
    only ignores difficult at assignment.  (A crowd-style
    intersection/det-area IoU would wrongly ignore the detection.)"""
    ann = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "height": 100, "width": 100}
        ],
        "annotations": [
            # difficult 20x20 GT; a 10x10 det inside it has plain IoU
            # 0.25 (<0.5) but intersection/det-area 1.0
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 1},
            {"id": 2, "image_id": 1, "category_id": 1,
             "bbox": [60, 60, 10, 10], "area": 100, "iscrowd": 0},
        ],
        "categories": [{"id": 1, "name": "x"}],
    }
    p = tmp_path / "d.json"
    p.write_text(json.dumps(ann))
    idx = CocoIndex(str(p))
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [12, 12, 10, 10],
         "score": 0.9},  # inside the difficult GT: FP, not ignored
        {"image_id": 1, "category_id": 1, "bbox": [60, 60, 10, 10],
         "score": 0.8},  # perfect match on the real GT
    ]
    out = eval_detection_voc(dets, idx)
    # FP at rank 1 then TP at rank 2: precision at full recall = 1/2
    assert abs(out["mAP"] - 0.5) < 1e-6


def test_voc_eval_both_metrics_single_pass(tmp_path):
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.evaluation.voc_eval import (
        eval_detection_voc_all_metrics,
    )

    idx = make_index(tmp_path)
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
         "score": 0.9},
    ]
    cont, p11 = eval_detection_voc_all_metrics(dets, idx)
    assert cont == eval_detection_voc(dets, idx)
    assert p11 == eval_detection_voc(dets, idx, use_07_metric=True)


def test_visualization_roundtrip():
    img = np.zeros((50, 60, 3), np.uint8) + 100
    out = overlay_detections(
        img,
        boxes=np.array([[5, 5, 30, 30]]),
        scores=np.array([0.9]),
        labels=np.array([1]),
        class_names=["bg", "cat"],
        masks=np.ones((1, 50, 60), np.uint8),
    )
    assert out.shape == img.shape
    assert not np.array_equal(out, img)  # something was drawn

    heat = uncertainty_heatmap(
        img, np.array([[10, 10, 40, 40]]), np.ones((1, 14, 14))
    )
    assert heat.shape == img.shape
    # red channel boosted inside the box
    assert heat[25, 25, 0] > img[25, 25, 0]


def test_denormalize():
    raw = np.zeros((4, 4, 3), np.float32)
    out = denormalize_image(raw)
    assert out.dtype == np.uint8
    assert out[0, 0, 0] > 0  # mean added back
