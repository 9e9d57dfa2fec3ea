"""WSDDN weakly-supervised detection head (parity component).

Re-design of reference modeling/roi_heads/wsddn_head/* (enabled by
MODEL.ROI_BOX_HEAD.WSDDN, box_head.py:88-89): two parallel streams over
pooled RoI features — a classification stream softmaxed over classes
and a detection stream softmaxed over proposals — multiplied into
per-proposal class scores; image-level scores are the proposal sum,
trained with binary CE against image-level labels.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.losses import binary_cross_entropy_with_logits


class WSDDNHead(nn.Module):
    num_classes: int  # incl. the background slot at 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        pooled_vec: jnp.ndarray,  # [B, S, D] avg-pooled RoI features
        proposal_valid: jnp.ndarray,  # [B, S]
    ):
        # the reference predictor puts both linear streams directly on
        # the pooled features (wsddn_head/roi_box_predictors.py:10-28 --
        # no hidden MLP)
        cls_logits = nn.Dense(
            self.num_classes, dtype=self.dtype, name="cls_score"
        )(pooled_vec)
        det_logits = nn.Dense(
            self.num_classes, dtype=self.dtype, name="det_score"
        )(pooled_vec)
        big_neg = jnp.asarray(-1e9, cls_logits.dtype)
        cls_sm = jax.nn.softmax(cls_logits, axis=-1)  # over classes
        det_sm = jax.nn.softmax(
            jnp.where(proposal_valid[..., None], det_logits, big_neg),
            axis=-2,  # over proposals
        )
        proposal_scores = cls_sm * det_sm  # [B, S, C]
        image_scores = jnp.sum(
            proposal_scores * proposal_valid[..., None], axis=1
        )  # [B, C]
        return proposal_scores, image_scores


def wsddn_inference(
    proposal_scores: jnp.ndarray,  # [B, S, C]
    boxes: jnp.ndarray,  # [B, S, 4]
    valid: jnp.ndarray,  # [B, S]
    score_thresh: float = 0.0001,
    nms_thresh: float = 0.5,
    detections_per_img: int = 100,
    nms_tile: int = 256,
):
    """WSDDN eval (reference wsddn_head/inference.py:42-130): the
    proposal boxes themselves (no regression), per-class score
    threshold + NMS, top detections over all classes.  Class 0 is the
    background slot and is skipped, like the box-head postprocessor."""
    from ...ops.nms import batched_nms
    from .box_head import Detections

    num_classes = proposal_scores.shape[-1]

    def per_image(scores, props, pvalid):
        cand = scores[:, 1:]  # skip background
        cand_valid = (cand > score_thresh) & pvalid[:, None]
        flat = jnp.where(cand_valid, cand, -1.0).reshape(-1)
        k = min(10 * detections_per_img, flat.shape[0])
        top_scores, top_idx = jax.lax.top_k(flat, k)
        roi_idx = top_idx // (num_classes - 1)
        cls_idx = top_idx % (num_classes - 1) + 1
        top_boxes = props[roi_idx]
        top_valid = top_scores > score_thresh
        keep_idx, keep_valid = batched_nms(
            top_boxes, top_scores, cls_idx, top_valid, nms_thresh,
            detections_per_img, nms_tile,
        )
        return Detections(
            boxes=top_boxes[keep_idx],
            scores=top_scores[keep_idx],
            labels=cls_idx[keep_idx].astype(jnp.int32),
            valid=keep_valid,
        )

    return jax.vmap(per_image)(proposal_scores, boxes, valid)


def wsddn_loss(
    image_scores: jnp.ndarray,
    image_labels: jnp.ndarray,
    background_weight: float = 1.0,
) -> jnp.ndarray:
    """Multi-label image-level BCE (wsddn_head/loss.py:13-31): positive
    term -t*log(p), negative term -(1-t)*log(1-p+1e-6) scaled by
    LOSS_WEIGHT_BACKGROUND, MEAN over every (image, class) entry."""
    p = jnp.clip(image_scores, 1e-6, None)
    neg = jnp.log(jnp.clip(1.0 - p, 0.0, None) + 1e-6)
    ce = -(image_labels * jnp.log(p)) - (
        (1.0 - image_labels) * neg * background_weight
    )
    return jnp.mean(ce)
