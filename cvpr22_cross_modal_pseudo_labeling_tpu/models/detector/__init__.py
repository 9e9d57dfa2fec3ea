from .generalized_rcnn import (
    GeneralizedRCNN,
    RCNNEvalOutput,
    RCNNTrainOutput,
    TeacherPseudoOutput,
)
from .statics import RCNNStatics, statics_from_cfg


def build_detection_model(cfg):
    """Registry dispatch mirroring reference detector/detectors.py:7-16."""
    arch = cfg.MODEL.META_ARCHITECTURE
    if arch == "GeneralizedRCNN":
        return GeneralizedRCNN(statics_from_cfg(cfg))
    if arch == "STGeneralizedRCNN":
        from .st_generalized_rcnn import STGeneralizedRCNN, st_statics_from_cfg

        return STGeneralizedRCNN(st_statics_from_cfg(cfg))
    if arch == "MMSS-GCNN":
        from .mmss_gcnn import MMSSGridModel, mmss_statics_from_cfg

        return MMSSGridModel(mmss_statics_from_cfg(cfg))
    raise ValueError(f"Unknown META_ARCHITECTURE {arch}")
