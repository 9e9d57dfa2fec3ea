from .losses import (
    binary_cross_entropy_with_logits,
    smooth_l1_loss,
    softmax_cross_entropy,
)
from .masks import (
    crop_resize_from_box_frame,
    crop_resize_from_box_frame_batch,
    paste_masks_np,
    project_masks_on_boxes,
)
from .deform_conv import deform_conv2d, deform_psroi_pool
from .nms import batched_nms, nms
from .nms_pallas import nms_pallas
from .roi_align_mxu import roi_align_mxu
from .roi_align import roi_align
from .roi_pool import roi_pool
from .sigmoid_focal_loss import sigmoid_focal_loss
