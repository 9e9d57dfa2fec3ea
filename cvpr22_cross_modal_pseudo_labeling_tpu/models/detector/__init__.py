from .generalized_rcnn import (
    GeneralizedRCNN,
    RCNNEvalOutput,
    RCNNTrainOutput,
    TeacherPseudoOutput,
)
from .statics import RCNNStatics, statics_from_cfg

# meta-architecture families: dispatch helpers for engine/CLI code that
# branches on the training-step shape rather than the exact class
RCNN_FAMILY = ("GeneralizedRCNN", "SBBaseline", "OMP", "BA_RPN")
ST_FAMILY = ("STGeneralizedRCNN", "SoftTeacher", "UnbiasedTeacher")


def build_detection_model(cfg, data_shards: int = 1):
    """Registry dispatch mirroring reference detector/detectors.py:7-16.

    ``data_shards`` is the mesh's data-axis size: it sets the
    FPN_POST_NMS_PER_BATCH group granularity so the cross-level top-N
    matches the reference's per-GPU selection (rpn/inference.py:154-171).
    """
    arch = cfg.MODEL.META_ARCHITECTURE
    if arch == "GeneralizedRCNN" and cfg.MODEL.RETINANET_ON:
        # reference: RETINANET_ON swaps the rpn inside GeneralizedRCNN
        # (rpn.py:204-205); here it selects the standalone detector
        from ..rpn.retinanet import retinanet_statics_from_cfg
        from .retinanet import RetinaNetDetector

        import jax.numpy as jnp

        depth = cfg.MODEL.BACKBONE.CONV_BODY
        for suffix in ("-FPN-RETINANET", "-FPN", "-C5", "-C4"):
            if depth.endswith(suffix):
                depth = depth[: -len(suffix)]
                break
        dtype = (
            jnp.bfloat16
            if cfg.TPU.COMPUTE_DTYPE == "bfloat16"
            else jnp.float32
        )
        return RetinaNetDetector(
            retinanet_statics_from_cfg(cfg),
            backbone_depth=depth,
            dtype=dtype,
        )
    if arch == "GeneralizedRCNN":
        return GeneralizedRCNN(statics_from_cfg(cfg, data_shards=data_shards))
    if arch == "STGeneralizedRCNN":
        from .st_generalized_rcnn import STGeneralizedRCNN, st_statics_from_cfg

        return STGeneralizedRCNN(st_statics_from_cfg(cfg, data_shards=data_shards))
    if arch == "MMSS-GCNN":
        from .mmss_gcnn import MMSSGridModel, mmss_statics_from_cfg

        return MMSSGridModel(mmss_statics_from_cfg(cfg))
    if arch in ("SoftTeacher", "UnbiasedTeacher"):
        from . import baselines
        from .st_generalized_rcnn import st_statics_from_cfg

        cls = (
            baselines.SoftTeacherRCNN
            if arch == "SoftTeacher"
            else baselines.UnbiasedTeacherRCNN
        )
        return cls(st_statics_from_cfg(cfg, data_shards=data_shards))
    if arch in ("SBBaseline", "OMP", "BA_RPN"):
        # GeneralizedRCNN skeletons (reference baselines/{SB,OMP,BA_RPN},
        # unregistered upstream); registered here for completeness
        from . import baselines

        cls = {
            "SBBaseline": baselines.SBBaseline,
            "OMP": baselines.OMPBaseline,
            "BA_RPN": baselines.BARPNBaseline,
        }[arch]
        return cls(statics_from_cfg(cfg, data_shards=data_shards))
    raise ValueError(f"Unknown META_ARCHITECTURE {arch}")
