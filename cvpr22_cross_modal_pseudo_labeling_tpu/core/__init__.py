from .boxes import (
    Boxes,
    box_area,
    box_iou,
    clip_to_image,
    compact_topk,
    concat_boxes,
    flip_horizontal,
    nonempty_mask,
    pad_boxes,
    resize_boxes,
    xywh_to_xyxy,
    xyxy_to_xywh,
)
from .box_coder import decode_boxes, encode_boxes
from .image_list import ImageBatch, to_image_batch
from .matcher import BELOW_LOW_THRESHOLD, BETWEEN_THRESHOLDS, match_boxes
from .sampler import balanced_sample_indices, balanced_sample_masks
