import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.engine.bbox_aug import (
    im_detect_bbox_aug,
)


def test_im_detect_bbox_aug_merges_variants():
    image = np.zeros((100, 200, 3), np.float32)
    calls = []

    def run_variant(img, hw, flipped):
        calls.append((hw, flipped))
        # the "model" finds one box at a fixed location; flipped runs
        # report it in the flipped frame so the driver must unflip it
        box = np.array([[20.0, 10.0, 60.0, 50.0]])
        if flipped:
            w = img.shape[1]
            box = np.array(
                [[w - 60.0 - 1, 10.0, w - 20.0 - 1, 50.0]]
            )
        return box, np.array([0.9 if not flipped else 0.8]), np.array([3])

    boxes, scores, labels = im_detect_bbox_aug(
        run_variant,
        image,
        scales=(400,),
        max_size=600,
        h_flip=True,
        scale_h_flip=True,
        base_scale=100,
    )
    # variants: base, base+flip, scale, scale+flip
    assert len(calls) == 4
    assert any(f for _, f in calls) and any(not f for _, f in calls)
    # all four detections collapse to one box after NMS (same location)
    assert len(boxes) == 1
    np.testing.assert_allclose(boxes[0], [20, 10, 60, 50], atol=1e-5)
    assert scores[0] == 0.9
    assert labels[0] == 3
