from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
    build_detection_model,
)


def test_build_dispatch():
    for arch, cls_name in [
        ("GeneralizedRCNN", "GeneralizedRCNN"),
        ("STGeneralizedRCNN", "STGeneralizedRCNN"),
        ("MMSS-GCNN", "MMSSGridModel"),
    ]:
        cfg = get_default_cfg()
        cfg.MODEL.META_ARCHITECTURE = arch
        if arch == "MMSS-GCNN":
            cfg.MODEL.BACKBONE.CONV_BODY = "R-50-C5"
        model = build_detection_model(cfg)
        assert type(model).__name__ == cls_name


def test_build_unknown_raises():
    cfg = get_default_cfg()
    cfg.MODEL.META_ARCHITECTURE = "NotAThing"
    try:
        build_detection_model(cfg)
        raised = False
    except ValueError:
        raised = True
    assert raised
