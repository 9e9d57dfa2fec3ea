import numpy as np
import pytest

from cvpr22_cross_modal_pseudo_labeling_tpu.utils.native import (
    get_lib,
    native_nms,
    native_rle_iou_matrix,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.utils.rle import (
    encode_mask,
    rle_iou_matrix,
)

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native maskops not built"
)


def test_native_iou_matches_numpy():
    rng = np.random.RandomState(0)
    dts = [encode_mask((rng.rand(40, 30) < 0.3).astype(np.uint8)) for _ in range(5)]
    gts = [encode_mask((rng.rand(40, 30) < 0.3).astype(np.uint8)) for _ in range(4)]
    crowd = [False, True, False, False]
    ref = rle_iou_matrix(dts, gts, crowd)
    out = native_rle_iou_matrix(dts, gts, crowd)
    np.testing.assert_allclose(out, ref, atol=1e-9)


def test_native_nms_matches_greedy():
    from tests.test_nms import np_greedy_nms, random_boxes

    rng = np.random.RandomState(1)
    boxes = random_boxes(rng, 200)
    scores = rng.uniform(0, 1, 200).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    keep_sorted = native_nms(boxes[order], 0.5, 200)
    ours = order[keep_sorted]
    ref = np_greedy_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(ours, ref)
