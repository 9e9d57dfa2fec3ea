import json

import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.data.coco_index import CocoIndex
from cvpr22_cross_modal_pseudo_labeling_tpu.data.evaluation.box_proposals import (
    evaluate_box_proposals,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.bbox_aug import (
    flip_boxes_np,
    merge_and_filter,
)


def test_box_proposal_ar(tmp_path):
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
    idx = CocoIndex(str(p))
    # one perfect proposal, one miss
    props = {1: np.array([[10, 10, 29, 29, 0.9]], np.float64)}
    out = evaluate_box_proposals(props, idx)
    assert out["num_pos"] == 2
    assert abs(out["ar"] - 0.5) < 1e-6

    props = {
        1: np.array(
            [[10, 10, 29, 29, 0.9], [60, 60, 79, 79, 0.8]], np.float64
        )
    }
    out = evaluate_box_proposals(props, idx)
    assert abs(out["ar"] - 1.0) < 1e-6


def test_flip_boxes_involution():
    b = np.array([[10.0, 5.0, 30.0, 25.0]])
    np.testing.assert_allclose(
        flip_boxes_np(flip_boxes_np(b, 100), 100), b
    )


def test_merge_and_filter_dedups():
    # identical box from two augmentations: NMS keeps one
    b = np.array([[10.0, 10.0, 30.0, 30.0]])
    boxes, scores, labels = merge_and_filter(
        [b, b + 0.5],
        [np.array([0.9]), np.array([0.8])],
        [np.array([1]), np.array([1])],
    )
    assert len(boxes) == 1
    assert scores[0] == 0.9


def test_merge_and_filter_classes_independent():
    b = np.array([[10.0, 10.0, 30.0, 30.0]])
    boxes, scores, labels = merge_and_filter(
        [b, b],
        [np.array([0.9]), np.array([0.8])],
        [np.array([1]), np.array([2])],
    )
    assert len(boxes) == 2


def test_gather_objects_two_process_simulation():
    """Multi-host prediction gather (reference utils/comm.py:48-88):
    arbitrary python objects (COCO dicts with RLE strings) round-trip
    through the padded-uint8 allgather.  Two processes are simulated by
    injecting an allgather that stacks both processes' contributions."""
    import pickle

    import numpy as np

    from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import (
        gather_objects,
    )

    objs = [
        [{"image_id": 1, "segmentation": {"size": [5, 5], "counts": "05"},
          "score": 0.5}],
        [{"image_id": 2, "bbox": [1.0, 2.0, 3.0, 4.0]},
         {"image_id": 3, "bbox": [0.0, 0.0, 1.0, 1.0]}],
    ]
    datas = [np.frombuffer(pickle.dumps(o), np.uint8) for o in objs]
    max_len = max(d.size for d in datas)

    def make_allgather(my_rank):
        def allgather(x):
            x = np.asarray(x)
            if x.dtype == np.int64:  # the lengths round
                return np.stack(
                    [np.asarray([d.size], np.int64) for d in datas]
                )
            # the payload round: other ranks' padded buffers
            out = np.zeros((2, max_len), np.uint8)
            for r, d in enumerate(datas):
                out[r, : d.size] = d
            np.testing.assert_array_equal(out[my_rank], x)
            return out

        return allgather

    for rank in range(2):
        gathered = gather_objects(
            objs[rank], allgather=make_allgather(rank), n_processes=2
        )
        assert gathered == objs

    # single-process short-circuit
    assert gather_objects(objs[0], n_processes=1) == [objs[0]]


def test_make_mesh_non_divisible_raises():
    import pytest

    from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import (
        make_mesh,
    )

    with pytest.raises(ValueError, match="does not divide"):
        make_mesh(("data", "model"), (-1, 3))  # 8 devices % 3 != 0
    with pytest.raises(ValueError, match="are available"):
        make_mesh(("data",), (5,))


def test_setup_logger_late_save_dir_attaches_file(tmp_path):
    import logging
    import os

    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.logger import (
        setup_logger,
    )

    name = "cmpl_tpu_test_late_file"
    # first call: non-zero rank, no save_dir -> NullHandler only
    lg = setup_logger(name, save_dir=None, process_index=1)
    assert all(
        isinstance(h, logging.NullHandler) for h in lg.handlers
    )
    # second call learns save_dir -> FileHandler must attach
    lg = setup_logger(name, save_dir=str(tmp_path), process_index=1)
    assert any(isinstance(h, logging.FileHandler) for h in lg.handlers)
    lg.info("hello")
    for h in lg.handlers:
        h.flush()
    assert os.path.exists(tmp_path / "log.txt.rank1")
    # idempotent: a third call adds no duplicate handlers
    n = len(lg.handlers)
    setup_logger(name, save_dir=str(tmp_path), process_index=1)
    assert len(lg.handlers) == n


def test_to_image_batch_oversize_bucket_raises():
    import numpy as np
    import pytest

    from cvpr22_cross_modal_pseudo_labeling_tpu.core.image_list import (
        to_image_batch,
    )

    ims = [np.zeros((80, 133, 3), np.float32)]
    with pytest.raises(ValueError, match="exceeds the forced bucket"):
        to_image_batch(ims, bucket_hw=(64, 64))
