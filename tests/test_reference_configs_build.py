"""The five shipped reference YAMLs must load AND build their
meta-architecture through our statics builders."""

import os

import pytest

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
    build_detection_model,
)

REF_CONFIGS = [
    "/root/reference/configs/coco_cap_det/zeroshot_mask.yaml",
    "/root/reference/configs/coco_cap_det/mmss.yaml",
    "/root/reference/configs/coco_cap_det/"
    "student_teacher_mask_rcnn_uncertainty.yaml",
    "/root/reference/configs/conceptual_openimages_det/zeroshot_mask.yaml",
    "/root/reference/configs/conceptual_openimages_det/"
    "student_teacher_mask_rcnn_uncertainty.yaml",
]

OUR_CONFIGS = [
    "configs/coco_cap_det/zeroshot_mask.yaml",
    "configs/coco_cap_det/mmss.yaml",
    "configs/coco_cap_det/student_teacher_mask_rcnn_uncertainty.yaml",
    "configs/conceptual_openimages_det/zeroshot_mask.yaml",
    "configs/conceptual_openimages_det/"
    "student_teacher_mask_rcnn_uncertainty.yaml",
]


@pytest.mark.parametrize(
    "path",
    [p for p in REF_CONFIGS if os.path.exists(p)] + OUR_CONFIGS,
)
def test_config_builds_model(path):
    cfg = get_default_cfg()
    cfg.merge_from_file(path)
    model = build_detection_model(cfg)
    assert model is not None
    arch = cfg.MODEL.META_ARCHITECTURE
    if arch == "GeneralizedRCNN":
        assert model.statics.embedding_based
        assert model.statics.mask_on
    elif arch == "STGeneralizedRCNN":
        assert model.statics.uncertainty
        assert model.statics.base.rpn_dont_train
    else:
        assert "GroundingHead" in model.statics.heads
