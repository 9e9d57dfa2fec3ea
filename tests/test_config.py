import textwrap

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg


def test_defaults_have_reference_keys():
    cfg = get_default_cfg()
    assert cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN == 12000
    assert cfg.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS == (10.0, 10.0, 5.0, 5.0)
    assert cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES == (1.0 / 16,)
    assert cfg.INPUT.PIXEL_MEAN == (102.9801, 115.9465, 122.7717)
    assert cfg.SOLVER.WARMUP_FACTOR == 1.0 / 3


def test_merge_from_yaml(tmp_path):
    yaml_text = textwrap.dedent(
        """
        MODEL:
          MASK_ON: True
          META_ARCHITECTURE: "STGeneralizedRCNN"
          LAMBDA_PSEUDO_LABEL: 0.1
          ROI_BOX_HEAD:
            NUM_CLASSES: 49
            EMBEDDING_BASED: True
            LOSS_WEIGHT_BACKGROUND: 0.2
        SOLVER:
          BASE_LR: 0.005
          STEPS: (20000, 50000)
        """
    )
    p = tmp_path / "exp.yaml"
    p.write_text(yaml_text)
    cfg = get_default_cfg()
    cfg.merge_from_file(str(p))
    assert cfg.MODEL.MASK_ON is True
    assert cfg.MODEL.META_ARCHITECTURE == "STGeneralizedRCNN"
    assert cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES == 49
    assert cfg.MODEL.ROI_BOX_HEAD.LOSS_WEIGHT_BACKGROUND == 0.2
    # yaml parses "(20000, 50000)" as a string; merge must coerce to tuple
    assert tuple(cfg.SOLVER.STEPS) == (20000, 50000)


def test_merge_from_list_and_freeze():
    cfg = get_default_cfg()
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.02", "MODEL.MASK_ON", "True"])
    assert cfg.SOLVER.BASE_LR == 0.02
    assert cfg.MODEL.MASK_ON is True
    cfg.freeze()
    try:
        cfg.SOLVER.BASE_LR = 1.0
        raised = False
    except AttributeError:
        raised = True
    assert raised


def test_reference_yaml_loads_unchanged():
    """The reference's shipped experiment YAMLs must merge cleanly."""
    import os

    ref_cfgs = [
        "/root/reference/configs/coco_cap_det/zeroshot_mask.yaml",
        "/root/reference/configs/coco_cap_det/mmss.yaml",
        "/root/reference/configs/coco_cap_det/student_teacher_mask_rcnn_uncertainty.yaml",
        "/root/reference/configs/conceptual_openimages_det/zeroshot_mask.yaml",
        "/root/reference/configs/conceptual_openimages_det/student_teacher_mask_rcnn_uncertainty.yaml",
    ]
    for path in ref_cfgs:
        if not os.path.exists(path):
            continue
        cfg = get_default_cfg()
        cfg.merge_from_file(path)
        assert cfg.MODEL.META_ARCHITECTURE in (
            "GeneralizedRCNN",
            "STGeneralizedRCNN",
            "MMSS-GCNN",
        )
