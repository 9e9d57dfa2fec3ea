import json

import numpy as np
import pytest

from cvpr22_cross_modal_pseudo_labeling_tpu.data.coco_index import CocoIndex
from cvpr22_cross_modal_pseudo_labeling_tpu.data.evaluation import (
    evaluate,
    filter_predictions_imagelevel,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.data.evaluation.coco_eval import (
    CocoStyleEvaluator,
    bbox_iou_xywh,
    check_expected_results,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.data.evaluation.prepare import (
    detections_to_coco_results,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.utils.rle import encode_mask


def make_index(tmp_path, gts):
    ann = {
        "images": [
            {"id": i, "file_name": f"{i}.jpg", "height": 100, "width": 100}
            for i in sorted({g["image_id"] for g in gts})
        ],
        "annotations": [
            dict(g, id=j + 1, area=g["bbox"][2] * g["bbox"][3], iscrowd=g.get("iscrowd", 0))
            for j, g in enumerate(gts)
        ],
        "categories": [
            {"id": 1, "name": "cat", "split": "seen"},
            {"id": 2, "name": "dog", "split": "unseen"},
        ],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    return CocoIndex(str(p))


def test_bbox_iou_xywh_no_plus_one():
    d = np.array([[0.0, 0.0, 10.0, 10.0]])
    g = np.array([[0.0, 0.0, 10.0, 10.0]])
    np.testing.assert_allclose(bbox_iou_xywh(d, g, [False]), [[1.0]])
    g2 = np.array([[5.0, 0.0, 10.0, 10.0]])
    np.testing.assert_allclose(
        bbox_iou_xywh(d, g2, [False]), [[50.0 / 150.0]]
    )


def test_perfect_detection_ap1(tmp_path):
    gts = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20]},
        {"image_id": 1, "category_id": 2, "bbox": [50, 50, 20, 20]},
        {"image_id": 2, "category_id": 1, "bbox": [30, 30, 40, 40]},
    ]
    idx = make_index(tmp_path, gts)
    ev = CocoStyleEvaluator(idx, "bbox")
    ev.update(
        [dict(g, score=0.9) for g in gts]
    )
    ev.accumulate()
    s = ev.summarize()
    assert s["AP"] == pytest.approx(1.0)
    assert s["AP50"] == pytest.approx(1.0)
    assert s["AR@100"] == pytest.approx(1.0)


def test_missed_and_false_positive(tmp_path):
    gts = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20]},
        {"image_id": 1, "category_id": 1, "bbox": [60, 60, 20, 20]},
    ]
    idx = make_index(tmp_path, gts)
    ev = CocoStyleEvaluator(idx, "bbox")
    # one perfect hit (higher score), one false positive (lower score)
    ev.update(
        [
            {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
             "score": 0.9},
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 5, 5],
             "score": 0.3},
        ]
    )
    ev.accumulate()
    s = ev.summarize()
    # recall 0.5, precision 1.0 up to that recall -> AP50 ~ 0.5
    assert s["AP50"] == pytest.approx(0.5, abs=0.02)
    assert s["AR@100"] == pytest.approx(0.5)


def test_crowd_gt_is_ignored(tmp_path):
    gts = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
         "iscrowd": 1},
    ]
    idx = make_index(tmp_path, gts)
    ev = CocoStyleEvaluator(idx, "bbox")
    ev.update(
        [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
          "score": 0.9}]
    )
    ev.accumulate()
    s = ev.summarize()
    # no non-ignored gt: category contributes nothing -> AP = -1
    assert s["AP"] == -1.0


def test_segm_evaluation(tmp_path):
    m = np.zeros((100, 100), np.uint8)
    m[10:30, 10:30] = 1
    gts = [
        {
            "image_id": 1,
            "category_id": 1,
            "bbox": [10, 10, 20, 20],
            "segmentation": encode_mask(m),
        }
    ]
    idx = make_index(tmp_path, gts)
    ev = CocoStyleEvaluator(idx, "segm")
    ev.update(
        [
            {
                "image_id": 1,
                "category_id": 1,
                "bbox": [10, 10, 20, 20],
                "score": 0.8,
                "segmentation": encode_mask(m),
            }
        ]
    )
    ev.accumulate()
    assert ev.summarize()["AP"] == pytest.approx(1.0)


def test_segm_evaluation_box_only_gt_does_not_crash(tmp_path):
    """GT annotations without ANY segmentation (box-only pseudo-label
    datasets) must be dropped from the segm protocol, not KeyError the
    evaluator (pycocotools' annToRLE would crash here — documented
    robustness divergence)."""
    m = np.zeros((100, 100), np.uint8)
    m[10:30, 10:30] = 1
    gts = [
        {
            "image_id": 1,
            "category_id": 1,
            "bbox": [10, 10, 20, 20],
            "segmentation": encode_mask(m),
        },
        # box-only GT in the same (image, category) cell
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 20, 20]},
        # empty-polygon-list GT (present in some COCO-style exports):
        # equally mask-less, must be dropped too, not rasterized into
        # an unmatchable zero-area RLE
        {"image_id": 1, "category_id": 1, "bbox": [70, 70, 20, 20],
         "segmentation": []},
    ]
    idx = make_index(tmp_path, gts)
    ev = CocoStyleEvaluator(idx, "segm")
    ev.update(
        [
            {
                "image_id": 1,
                "category_id": 1,
                "bbox": [10, 10, 20, 20],
                "score": 0.8,
                "segmentation": encode_mask(m),
            }
        ]
    )
    ev.accumulate()
    # the box-only GT is excluded entirely: full recall on the one
    # maskable GT
    assert ev.summarize()["AP"] == pytest.approx(1.0)


def test_per_class_and_split_ap50(tmp_path):
    gts = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20]},
        {"image_id": 1, "category_id": 2, "bbox": [50, 50, 20, 20]},
    ]
    idx = make_index(tmp_path, gts)
    ev = CocoStyleEvaluator(idx, "bbox")
    # only the 'cat' class detected
    ev.update(
        [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
          "score": 0.9}]
    )
    ev.accumulate()
    pc = ev.per_class_ap50()
    assert pc[1] == pytest.approx(1.0)
    assert pc[2] == pytest.approx(0.0)
    splits = ev.per_split_ap50({"seen": [1], "unseen": [2]})
    assert splits["AP50_split_seen"] == pytest.approx(1.0)
    assert splits["AP50_split_unseen"] == pytest.approx(0.0)


def test_imagelevel_filter():
    dets = [
        {"image_id": 1, "category_id": 1, "score": 0.5},
        {"image_id": 1, "category_id": 2, "score": 0.5},
        {"image_id": 2, "category_id": 2, "score": 0.5},
    ]
    out = filter_predictions_imagelevel(dets, {1: [1]})
    assert len(out) == 2  # image 2 has no verified list -> kept


def test_check_expected_results():
    res = {"bbox/AP50": 0.5}
    ok = check_expected_results(res, [("bbox", "AP50", 0.5, 0.01)], 4)
    assert ok == []
    bad = check_expected_results(res, [("bbox", "AP50", 0.9, 0.01)], 4)
    assert len(bad) == 1


def test_detections_to_coco_results_scaling():
    boxes = np.array([[10.0, 10.0, 49.0, 49.0]])
    out = detections_to_coco_results(
        boxes,
        np.array([0.9]),
        np.array([1]),
        np.array([True]),
        None,
        image_id=7,
        input_hw=(100, 100),
        original_hw=(200, 200),
        contiguous_to_json={1: 17},
    )
    assert out[0]["category_id"] == 17
    np.testing.assert_allclose(out[0]["bbox"], [20, 20, 79, 79])


# ---------------------------------------------------------------------------
# Keypoint (OKS) evaluation — reference coco_eval.py:49-51,165-196
# ---------------------------------------------------------------------------

def _kp_flat(points, vis=2):
    out = []
    for x, y in points:
        out += [float(x), float(y), vis]
    return out


def test_oks_matrix_basics():
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.evaluation.coco_eval import (
        oks_matrix,
    )

    pts = [(10 + 3 * i, 20 + 2 * i) for i in range(17)]
    gt = {
        "keypoints": _kp_flat(pts),
        "bbox": [5.0, 15.0, 60.0, 45.0],
        "area": 2700.0,
    }
    exact = {"keypoints": _kp_flat(pts), "score": 0.9}
    off = {
        "keypoints": _kp_flat([(x + 40, y + 40) for x, y in pts]),
        "score": 0.8,
    }
    m = oks_matrix([exact, off], [gt], [False])
    assert m[0, 0] > 0.999
    assert m[1, 0] < 0.3
    # no-visible-keypoint gt: box-clamped distances (computeOks k1==0)
    gt0 = dict(gt, keypoints=_kp_flat(pts, vis=0))
    m0 = oks_matrix([exact], [gt0], [False])
    assert m0[0, 0] > 0.999  # inside the padded box -> zero distance


def test_keypoint_evaluator_protocol(tmp_path):
    pts = [(10 + 3 * i, 20 + 2 * i) for i in range(17)]
    gts = [
        {
            "image_id": 1,
            "category_id": 1,
            "bbox": [5.0, 15.0, 60.0, 45.0],
            "keypoints": _kp_flat(pts),
            "num_keypoints": 17,
        }
    ]
    idx = make_index(tmp_path, gts)
    ev = CocoStyleEvaluator(idx, "keypoints")
    ev.update(
        [
            {
                "image_id": 1,
                "category_id": 1,
                "bbox": [5.0, 15.0, 60.0, 45.0],
                "score": 0.9,
                "keypoints": _kp_flat(pts, vis=1),
            }
        ]
    )
    ev.accumulate()
    s = ev.summarize()
    assert s["AP"] == 1.0 and s["AR@20"] == 1.0
    assert "APs" not in s  # kp protocol has no small range

    # badly-off predictions score 0
    ev2 = CocoStyleEvaluator(idx, "keypoints")
    ev2.update(
        [
            {
                "image_id": 1,
                "category_id": 1,
                "bbox": [5.0, 15.0, 60.0, 45.0],
                "score": 0.9,
                "keypoints": _kp_flat([(x + 90, y + 90) for x, y in pts]),
            }
        ]
    )
    ev2.accumulate()
    assert ev2.summarize()["AP"] == 0.0


def test_keypoint_less_gt_ignored_in_cell_without_detections(tmp_path):
    """A (image, category) cell that has GTs but NO detections must
    still apply the num_keypoints==0 ignore before counting npig
    (ADVICE r2 medium: the merge used to sit after the no-dts early
    return, inflating the recall denominator)."""
    pts = [(10 + 3 * i, 20 + 2 * i) for i in range(17)]
    gts = [
        {
            "image_id": 1,
            "category_id": 1,
            "bbox": [5.0, 15.0, 60.0, 45.0],
            "keypoints": _kp_flat(pts),
            "num_keypoints": 17,
        },
        {
            # image 2: keypoint-less GT, and no detections submitted
            "image_id": 2,
            "category_id": 1,
            "bbox": [5.0, 15.0, 60.0, 45.0],
            "num_keypoints": 0,
            "keypoints": _kp_flat(pts, vis=0),
        },
    ]
    idx = make_index(tmp_path, gts)
    ev = CocoStyleEvaluator(idx, "keypoints")
    ev.update(
        [
            {
                "image_id": 1,
                "category_id": 1,
                "bbox": [5.0, 15.0, 60.0, 45.0],
                "score": 0.9,
                "keypoints": _kp_flat(pts, vis=1),
            }
        ]
    )
    ev.accumulate()
    s = ev.summarize()
    # pycocotools: the image-2 GT is ignored everywhere, so the single
    # perfect match yields AP == AR == 1.0 (not recall 1/2)
    assert s["AP"] == 1.0 and s["AR@20"] == 1.0


def test_detections_to_coco_results_keypoints():
    res = detections_to_coco_results(
        boxes=np.array([[10.0, 10.0, 50.0, 50.0]]),
        scores=np.array([0.9]),
        labels=np.array([1]),
        valid=np.array([True]),
        mask_probs=None,
        image_id=7,
        input_hw=(50, 50),
        original_hw=(100, 100),  # 2x upscale back to original
        contiguous_to_json={1: 1},
        keypoints=np.array([[[10.0, 20.0, 0.7]] * 17]),
    )
    kp = res[0]["keypoints"]
    assert len(kp) == 17 * 3
    assert kp[0] == 20.0 and kp[1] == 40.0 and kp[2] == 1.0


def test_keypoint_eval_instances_style_gt(tmp_path):
    """KEYPOINT_ON eval over a dataset whose annotations carry NO
    keypoints must not crash and must ignore all GTs (pycocotools
    _prepare: num_keypoints == 0 -> ignore)."""
    gts = [
        {
            "image_id": 1,
            "category_id": 1,
            "bbox": [5.0, 15.0, 60.0, 45.0],
        }
    ]
    idx = make_index(tmp_path, gts)
    ev = CocoStyleEvaluator(idx, "keypoints")
    ev.update(
        [
            {
                "image_id": 1,
                "category_id": 1,
                "bbox": [5.0, 15.0, 60.0, 45.0],
                "score": 0.9,
                "keypoints": _kp_flat([(10, 20)] * 17, vis=1),
            }
        ]
    )
    ev.accumulate()
    s = ev.summarize()
    assert s["AP"] == -1.0  # no valid gt anywhere -> undefined, not crash
