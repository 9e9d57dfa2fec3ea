"""Box head: C5 feature extractor + (open-vocabulary) predictor + loss +
postprocessing.

Re-design of reference modeling/roi_heads/box_head/ for TPU:
  * extractor — ResNet50Conv5ROIFeatureExtractor
    (roi_box_feature_extractors.py:13-46): RoIAlign 14x14 @ 1/16 then the
    C5 stage (stride 2 -> 7x7).
  * predictor — FastRCNNPredictor (roi_box_predictors.py:7-92): avgpool;
    embedding-based path projects to emb_dim and scores against a
    runtime-injected class-embedding matrix (einsum 'pe,ce->pc').  The
    reference mutates module state via set_class_embeddings
    (roi_box_predictors.py:84-92); here the matrix is a forward argument
    — state as data.
  * loss — matcher 0.5/0.5 (no low-quality), 512 rois/img sampling,
    background-weighted CE / labels.numel(), cls-agnostic smooth-L1 on
    map_inds [4..7] (loss.py:136-212).
  * postprocess — softmax, cls-agnostic decode, per-class
    threshold+NMS+top-100 (inference.py:49-163) via a global top-K
    prefilter + single class-offset batched NMS instead of the
    1203-iteration per-class Python loop.
"""

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.box_coder import decode_boxes, encode_boxes
from ...core.boxes import box_iou, clip_to_image
from ...core.matcher import match_boxes
from ...core.sampler import balanced_sample_indices
from ...ops.losses import smooth_l1_loss
from ..resnet import ResNetRoIHead


class BoxHeadOutputs(NamedTuple):
    class_logits: jnp.ndarray  # [N, C]
    box_deltas: jnp.ndarray  # [N, 4*num_reg_classes]
    embeddings: Optional[jnp.ndarray]  # [N, emb_dim] (embedding-based)
    features: jnp.ndarray  # [N, 7, 7, 2048] shared C5 features
    pooled_vec: jnp.ndarray  # [N, 2048] avg-pooled


class BoxPredictor(nn.Module):
    """FastRCNNPredictor. ``class_embeddings`` [C, emb_dim] replaces the
    mutable cls_score tensor."""

    embedding_based: bool = True
    emb_dim: int = 768
    num_classes: int = 81  # used only when not embedding_based
    cls_agnostic_bbox_reg: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled_vec, class_embeddings=None, class_valid=None):
        if self.embedding_based:
            emb = nn.Dense(
                self.emb_dim,
                kernel_init=nn.initializers.normal(0.01),
                dtype=self.dtype,
                name="emb_pred",
            )(pooled_vec)
            assert class_embeddings is not None, (
                "embedding-based predictor needs a class-embedding matrix"
            )
            logits = jnp.einsum(
                "pe,ce->pc", emb, class_embeddings.astype(emb.dtype)
            )
            if class_valid is not None:
                # vocab-parallel padding discipline: class tables padded
                # to a multiple of the 'model' mesh axis carry a [C] row
                # mask (engine/train_step.pad_vocab_tables); padded
                # columns are forced to -1e9 so exp() underflows to an
                # exact 0 in every downstream softmax — loss, postproc
                # and their gradients equal the unpadded computation
                # bit-for-bit.
                logits = jnp.where(
                    class_valid.astype(bool)[None, :],
                    logits,
                    jnp.asarray(-1e9, logits.dtype),
                )
            num_reg = 2
        else:
            emb = None
            logits = nn.Dense(
                self.num_classes,
                kernel_init=nn.initializers.normal(0.01),
                dtype=self.dtype,
                name="cls_score",
            )(pooled_vec)
            num_reg = 2 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(
            num_reg * 4,
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype,
            name="bbox_pred",
        )(pooled_vec)
        return logits, deltas, emb


class BoxHead(nn.Module):
    """extractor (C5) + predictor; input is pooled 14x14 RoI features."""

    embedding_based: bool = True
    emb_dim: int = 768
    num_classes: int = 81
    cls_agnostic_bbox_reg: bool = True
    in_channels: int = 1024
    res5_dilation: int = 1
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, pooled, class_embeddings=None, class_valid=None
    ) -> BoxHeadOutputs:
        x = ResNetRoIHead(
            in_channels=self.in_channels,
            num_groups=self.num_groups,
            width_per_group=self.width_per_group,
            stride_in_1x1=self.stride_in_1x1,
            dilation=self.res5_dilation,
            dtype=self.dtype,
            name="feature_extractor",
        )(pooled)
        vec = jnp.mean(x, axis=(1, 2))
        logits, deltas, emb = BoxPredictor(
            embedding_based=self.embedding_based,
            emb_dim=self.emb_dim,
            num_classes=self.num_classes,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            dtype=self.dtype,
            name="predictor",
        )(vec, class_embeddings, class_valid)
        return BoxHeadOutputs(logits, deltas, emb, x, vec)


# ---------------------------------------------------------------------------
# Subsampling (loss.py prepare_targets + subsample)
# ---------------------------------------------------------------------------

class SampledRoIs(NamedTuple):
    boxes: jnp.ndarray  # [B, S, 4]
    labels: jnp.ndarray  # [B, S] int32 (0 = background)
    reg_targets: jnp.ndarray  # [B, S, 4]
    valid: jnp.ndarray  # [B, S]
    is_pos: jnp.ndarray  # [B, S]
    matched_gt: jnp.ndarray  # [B, S] int32 index into gt

    def head(self, cap: int) -> "SampledRoIs":
        """First ``cap`` slots per image — since sampling orders
        positives first, this is the static-shape equivalent of
        keep_only_positive_boxes (mask_head.py:13-33) whenever
        #pos <= cap."""
        return SampledRoIs(*(a[:, :cap] for a in self))


def subsample_rois(
    proposals: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    key: jax.Array,
    batch_size_per_image: int = 512,
    positive_fraction: float = 0.25,
    fg_iou_threshold: float = 0.5,
    bg_iou_threshold: float = 0.5,
    reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0),
) -> SampledRoIs:
    """Batched positive/negative RoI sampling (loss.py:89-123)."""
    b = proposals.shape[0]
    keys = jax.random.split(key, b)

    def per_image(props, pvalid, gts, glabels, gvalid, k):
        quality = box_iou(gts, props)
        matched = match_boxes(
            quality, gvalid, fg_iou_threshold, bg_iou_threshold,
            allow_low_quality_matches=False,
        )
        pos = (matched >= 0) & pvalid
        neg = (matched == -1) & pvalid
        idx, valid, is_pos = balanced_sample_indices(
            pos, neg, k, batch_size_per_image, positive_fraction
        )
        sampled_boxes = props[idx]
        sampled_matched = jnp.clip(matched[idx], 0)
        labels = jnp.where(
            is_pos, glabels[sampled_matched].astype(jnp.int32), 0
        )
        reg_targets = encode_boxes(
            gts[sampled_matched], sampled_boxes, reg_weights
        )
        return SampledRoIs(
            sampled_boxes, labels, reg_targets, valid, is_pos, sampled_matched
        )

    return jax.vmap(per_image)(
        proposals, proposal_valid, gt_boxes, gt_labels, gt_valid, keys
    )


# ---------------------------------------------------------------------------
# Loss (loss.py:136-212)
# ---------------------------------------------------------------------------

def box_head_loss(
    class_logits: jnp.ndarray,
    box_deltas: jnp.ndarray,
    sampled: SampledRoIs,
    bg_weight: float = 1.0,
    cls_agnostic_bbox_reg: bool = True,
    sample_weights: Optional[jnp.ndarray] = None,
    focal_gamma: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """class_logits [B*S, C], box_deltas [B*S, 4*num_reg].

    classification = sum_i w_{y_i} (opt * sample_w_i) CE_i / N_valid;
    box = sum_pos smooth_l1(beta=1) / N_valid — both normalizations use
    labels.numel() == number of valid sampled rois (loss.py:174,170).

    focal_gamma: unbiased_teacher's pseudo-branch reweight
    (baselines/unbiased_teacher loss.py:193-197): the class-weighted CE
    is scaled by (1 - e^{-wCE})^gamma with the factor detached.
    """
    labels = sampled.labels.reshape(-1)
    valid = sampled.valid.reshape(-1)
    is_pos = sampled.is_pos.reshape(-1)
    reg_targets = sampled.reg_targets.reshape(-1, 4)
    n = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)

    logp = jax.nn.log_softmax(class_logits, axis=-1)
    ce = -jnp.take_along_axis(
        logp, jnp.clip(labels, 0)[:, None], axis=-1
    )[:, 0]
    class_w = jnp.where(labels == 0, bg_weight, 1.0)
    w = class_w * valid.astype(ce.dtype)
    if focal_gamma is not None:
        wce = ce * class_w
        focal = (1.0 - jnp.exp(-jax.lax.stop_gradient(wce))) ** focal_gamma
        w = w * focal
    if sample_weights is not None:
        w = w * sample_weights.reshape(-1)
    classification_loss = jnp.sum(ce * w) / n

    if cls_agnostic_bbox_reg:
        pos_deltas = box_deltas[:, 4:8]
    else:
        idx = 4 * jnp.clip(labels, 0)[:, None] + jnp.arange(4)[None, :]
        pos_deltas = jnp.take_along_axis(box_deltas, idx, axis=1)
    box_l = smooth_l1_loss(pos_deltas, reg_targets, beta=1.0)
    box_loss = jnp.sum(box_l * is_pos.astype(box_l.dtype)[:, None]) / n
    return classification_loss, box_loss


# ---------------------------------------------------------------------------
# Postprocess (inference.py:49-163)
# ---------------------------------------------------------------------------

class Detections(NamedTuple):
    boxes: jnp.ndarray  # [B, D, 4]
    scores: jnp.ndarray  # [B, D]
    labels: jnp.ndarray  # [B, D] int32
    valid: jnp.ndarray  # [B, D]


def postprocess_boxes(
    class_logits: jnp.ndarray,
    box_deltas: jnp.ndarray,
    proposals: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    image_sizes: jnp.ndarray,
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    detections_per_img: int = 100,
    pre_nms_candidates: int = 1000,
    reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0),
    cls_agnostic_bbox_reg: bool = True,
    nms_tile: int = 256,
    gt_override_labels: Optional[jnp.ndarray] = None,
) -> Detections:
    """class_logits [B, S, C]; box_deltas [B, S, 4*num_reg]; proposals
    [B, S, 4].

    Design note: the reference thresholds at 0.05 then runs NMS per class
    in a Python loop over all surviving candidates.  Here candidates
    across all (roi, class>=1) pairs are pre-filtered to the top
    ``pre_nms_candidates`` by score, then one class-offset batched NMS
    selects the final detections — identical results whenever every
    eventual detection is within the top-K prefilter (K defaults to 10x
    the detection cap).
    """
    num_classes = class_logits.shape[-1]
    if gt_override_labels is None:
        gt_override_labels = jnp.full(
            class_logits.shape[:2], -1, jnp.int32
        )

    def per_image(logits, deltas, props, pvalid, img_size, ovr):
        probs = jax.nn.softmax(logits, axis=-1)  # [S, C]
        # GT_BOX_EVAL score override (box_head/inference.py:82-89):
        # each gt proposal keeps only its own label's prob, boosted by
        # 1.1 so it survives score_thresh=1.0
        override_active = ovr >= 0
        onehot = jax.nn.one_hot(
            jnp.clip(ovr, 0), num_classes, dtype=probs.dtype
        ) * override_active[:, None]
        probs = jnp.where(
            jnp.any(override_active),
            onehot * (probs + 1.1),
            probs,
        )
        if cls_agnostic_bbox_reg:
            boxes = decode_boxes(deltas[:, -4:], props, reg_weights)
            boxes = clip_to_image(boxes, img_size)
            boxes_per_class = jnp.broadcast_to(
                boxes[:, None, :], (boxes.shape[0], num_classes, 4)
            )
        else:
            all_boxes = decode_boxes(deltas, props, reg_weights).reshape(
                -1, num_classes, 4
            )
            boxes_per_class = clip_to_image(all_boxes, img_size)

        # candidates: classes 1..C-1
        cand_scores = probs[:, 1:]  # [S, C-1]
        cand_valid = (
            (cand_scores > score_thresh) & pvalid[:, None]
        )
        flat_scores = jnp.where(cand_valid, cand_scores, -1.0).reshape(-1)
        k = min(pre_nms_candidates, flat_scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(flat_scores, k)
        roi_idx = top_idx // (num_classes - 1)
        cls_idx = top_idx % (num_classes - 1) + 1
        top_boxes = boxes_per_class[roi_idx, cls_idx]
        top_valid = top_scores > score_thresh

        from ...ops.nms import batched_nms

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

    return jax.vmap(per_image)(
        class_logits, box_deltas, proposals, proposal_valid, image_sizes,
        gt_override_labels,
    )
