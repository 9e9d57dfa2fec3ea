from .box_head import (
    BoxHead,
    BoxHeadOutputs,
    BoxPredictor,
    Detections,
    SampledRoIs,
    box_head_loss,
    postprocess_boxes,
    subsample_rois,
)
from .mask_head import (
    MaskPredictor,
    mask_head_inference,
    mask_head_loss,
)
from .pooler import assign_fpn_levels, boxes_to_rois, pool_rois
