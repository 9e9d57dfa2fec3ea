"""RetinaNet: head, loss, inference.

Re-design of reference modeling/rpn/retinanet/{retinanet,loss,inference}.py
(present in the reference but unused by its shipped configs — rebuilt
for component parity).  Anchors: one size per FPN level scaled over
SCALES_PER_OCTAVE octaves; head: 4-conv cls/reg towers shared across
levels with the prior-probability bias init; loss: sigmoid focal loss
over all anchors normalized by positive count + smooth-L1; inference:
per-level top-k + threshold then class-aware NMS.
"""

import math
from typing import Any, List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.box_coder import decode_boxes, encode_boxes
from ...core.boxes import box_iou, clip_to_image
from ...core.matcher import match_boxes
from ...ops.losses import smooth_l1_loss
from ...ops.nms import batched_nms
from ..backbone import device_normalize
from ...ops.sigmoid_focal_loss import sigmoid_focal_loss
from ..roi_heads.box_head import Detections
from .anchors import build_anchors_for_levels


class RetinaNetStatics(NamedTuple):
    num_classes: int = 81  # includes background at 0
    anchor_sizes: Tuple[float, ...] = (32, 64, 128, 256, 512)
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    octave: float = 2.0
    scales_per_octave: int = 3
    num_convs: int = 4
    prior_prob: float = 0.01
    fg_iou: float = 0.5
    bg_iou: float = 0.4
    bbox_reg_weight: float = 4.0
    bbox_reg_beta: float = 0.11
    loss_alpha: float = 0.25
    loss_gamma: float = 2.0
    pre_nms_top_n: int = 1000
    inference_th: float = 0.05
    nms_th: float = 0.4
    detections_per_img: int = 100
    # device-side uint8 normalization (models/backbone.py)
    pixel_mean: Tuple[float, ...] = (102.9801, 115.9465, 122.7717)
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    to_bgr255: bool = True


def retinanet_statics_from_cfg(cfg) -> RetinaNetStatics:
    r = cfg.MODEL.RETINANET
    return RetinaNetStatics(
        num_classes=r.NUM_CLASSES,
        anchor_sizes=tuple(r.ANCHOR_SIZES),
        anchor_strides=tuple(r.ANCHOR_STRIDES),
        aspect_ratios=tuple(r.ASPECT_RATIOS),
        octave=r.OCTAVE,
        scales_per_octave=r.SCALES_PER_OCTAVE,
        num_convs=r.NUM_CONVS,
        prior_prob=r.PRIOR_PROB,
        fg_iou=r.FG_IOU_THRESHOLD,
        bg_iou=r.BG_IOU_THRESHOLD,
        bbox_reg_weight=r.BBOX_REG_WEIGHT,
        bbox_reg_beta=r.BBOX_REG_BETA,
        loss_alpha=r.LOSS_ALPHA,
        loss_gamma=r.LOSS_GAMMA,
        pre_nms_top_n=r.PRE_NMS_TOP_N,
        inference_th=r.INFERENCE_TH,
        nms_th=r.NMS_TH,
        detections_per_img=cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG,
        pixel_mean=tuple(cfg.INPUT.PIXEL_MEAN),
        pixel_std=tuple(cfg.INPUT.PIXEL_STD),
        to_bgr255=cfg.INPUT.TO_BGR255,
    )


def retinanet_anchor_sizes(s: RetinaNetStatics):
    """Per-level size tuples with octave scales (retinanet.py builder)."""
    out = []
    for size in s.anchor_sizes:
        out.append(
            tuple(
                size * s.octave ** (i / float(s.scales_per_octave))
                for i in range(s.scales_per_octave)
            )
        )
    return out


class RetinaNetHead(nn.Module):
    """Shared cls/reg towers (retinanet.py RetinaNetHead)."""

    statics: RetinaNetStatics
    in_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        s = self.statics
        num_anchors = len(s.aspect_ratios) * s.scales_per_octave
        init = nn.initializers.normal(0.01)
        cls_tower = [
            nn.Conv(self.in_channels, (3, 3), padding=1, kernel_init=init,
                    dtype=self.dtype, name=f"cls_tower{i}")
            for i in range(s.num_convs)
        ]
        box_tower = [
            nn.Conv(self.in_channels, (3, 3), padding=1, kernel_init=init,
                    dtype=self.dtype, name=f"bbox_tower{i}")
            for i in range(s.num_convs)
        ]
        bias_value = -math.log((1 - s.prior_prob) / s.prior_prob)
        cls_logits = nn.Conv(
            num_anchors * (s.num_classes - 1), (3, 3), padding=1,
            kernel_init=init,
            bias_init=nn.initializers.constant(bias_value),
            dtype=self.dtype, name="cls_logits",
        )
        bbox_pred = nn.Conv(
            num_anchors * 4, (3, 3), padding=1, kernel_init=init,
            dtype=self.dtype, name="bbox_pred",
        )
        logits, bbox_reg = [], []
        for f in features:
            c = f
            for conv in cls_tower:
                c = nn.relu(conv(c))
            logits.append(cls_logits(c))
            b = f
            for conv in box_tower:
                b = nn.relu(conv(b))
            bbox_reg.append(bbox_pred(b))
        return logits, bbox_reg


def retinanet_loss(
    anchors: jnp.ndarray,
    cls_logits: jnp.ndarray,
    box_regression: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    s: RetinaNetStatics,
):
    """anchors [N,4]; cls_logits [B,N,C-1]; box_regression [B,N,4]."""

    def per_image(logits, reg, gts, glabels, gvalid):
        quality = box_iou(gts, anchors)
        matched = match_boxes(
            quality, gvalid, s.fg_iou, s.bg_iou,
            allow_low_quality_matches=True,
        )
        pos = matched >= 0
        ignore = matched == -2  # between thresholds
        labels = jnp.where(
            pos, glabels[jnp.clip(matched, 0)].astype(jnp.int32), 0
        )
        labels = jnp.where(ignore, -1, labels)
        cls = sigmoid_focal_loss(
            logits, labels, s.loss_gamma, s.loss_alpha
        ).sum(axis=-1)
        cls_sum = jnp.sum(cls * (labels >= 0))
        # the reference encodes regression targets with the SAME
        # (10, 10, 5, 5) coder used at inference (retinanet.py:101 —
        # one BoxCoder feeds both the loss evaluator and postprocessor)
        reg_targets = encode_boxes(
            gts[jnp.clip(matched, 0)], anchors, (10.0, 10.0, 5.0, 5.0)
        )
        reg_sum = jnp.sum(
            smooth_l1_loss(reg, reg_targets, beta=s.bbox_reg_beta)
            * pos[:, None]
        )
        return cls_sum, reg_sum, jnp.sum(pos)

    cls_sums, reg_sums, n_pos = jax.vmap(per_image)(
        cls_logits, box_regression, gt_boxes, gt_labels, gt_valid
    )
    b = cls_logits.shape[0]
    total_pos = jnp.sum(n_pos).astype(jnp.float32)
    # reference normalizations (retinanet/loss.py:66-80):
    # cls /(num_pos + num_images); reg /max(1, num_pos * regress_norm)
    return (
        jnp.sum(cls_sums) / (total_pos + b),
        jnp.sum(reg_sums)
        / jnp.maximum(total_pos * s.bbox_reg_weight, 1.0),
    )


def retinanet_inference(
    anchor_list: List[jnp.ndarray],
    cls_logits: List[jnp.ndarray],
    box_regression: List[jnp.ndarray],
    image_sizes: jnp.ndarray,
    s: RetinaNetStatics,
    nms_tile: int = 256,
) -> Detections:
    """Per-level top-k + decode, then class-aware NMS over the union."""
    b = cls_logits[0].shape[0]
    num_fg = s.num_classes - 1
    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    for anchors, logits, reg in zip(anchor_list, cls_logits, box_regression):
        n = anchors.shape[0]
        probs = jax.nn.sigmoid(
            logits.reshape(b, n, num_fg).astype(jnp.float32)
        )
        flat = probs.reshape(b, n * num_fg)
        k = min(s.pre_nms_top_n, flat.shape[1])
        topv, topi = jax.lax.top_k(flat, k)
        a_idx = topi // num_fg
        c_idx = topi % num_fg + 1
        reg_sel = jnp.take_along_axis(
            reg.reshape(b, n, 4).astype(jnp.float32),
            a_idx[..., None], axis=1,
        )
        anchor_sel = anchors[a_idx]
        boxes = decode_boxes(
            reg_sel.reshape(b, k, 4), anchor_sel, (10.0, 10.0, 5.0, 5.0)
        )
        boxes = jax.vmap(clip_to_image)(boxes, image_sizes)
        all_boxes.append(boxes)
        all_scores.append(topv)
        all_labels.append(c_idx)
        all_valid.append(topv > s.inference_th)
    boxes = jnp.concatenate(all_boxes, axis=1)
    scores = jnp.concatenate(all_scores, axis=1)
    labels = jnp.concatenate(all_labels, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)

    def per_image(bx, sc, lb, vl):
        idx, keep = batched_nms(
            bx, sc, lb, vl, s.nms_th, s.detections_per_img, nms_tile
        )
        return Detections(
            boxes=bx[idx], scores=sc[idx],
            labels=lb[idx].astype(jnp.int32), valid=keep,
        )

    return jax.vmap(per_image)(boxes, scores, labels, valid)


class RetinaNet(nn.Module):
    """Full single-stage detector: R-FPN-RETINANET backbone + head.
    Registered for parity; MODEL.RETINANET_ON in the reference."""

    statics: RetinaNetStatics
    backbone_depth: str = "R-50"
    backbone_out_channels: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        from ..backbone import ResNetFPNBackbone

        self.backbone = ResNetFPNBackbone(
            depth=self.backbone_depth,
            out_channels=self.backbone_out_channels,
            retinanet=True,
            dtype=self.dtype,
        )
        self.head = RetinaNetHead(
            self.statics, self.backbone_out_channels, self.dtype
        )

    def _anchors(self, feats):
        s = self.statics
        return build_anchors_for_levels(
            [f.shape[1:3] for f in feats],
            s.anchor_strides,
            retinanet_anchor_sizes(s),
            s.aspect_ratios,
        )

    def __call__(self, images, image_sizes, targets=None, train=False):
        s0 = self.statics
        images = device_normalize(
            images, image_sizes, s0.pixel_mean, s0.pixel_std, s0.to_bgr255
        )
        feats = self.backbone(images)
        logits, reg = self.head(feats)
        anchor_list = self._anchors(feats)
        if train:
            b = images.shape[0]
            s = self.statics
            num_fg = s.num_classes - 1
            flat_logits = jnp.concatenate(
                [l.reshape(b, -1, num_fg) for l in logits], axis=1
            )
            flat_reg = jnp.concatenate(
                [r.reshape(b, -1, 4) for r in reg], axis=1
            )
            anchors = jnp.concatenate(anchor_list, axis=0)
            cls_loss, reg_loss = retinanet_loss(
                anchors,
                flat_logits.astype(jnp.float32),
                flat_reg.astype(jnp.float32),
                targets["gt_boxes"],
                targets["gt_labels"],
                targets["gt_valid"],
                s,
            )
            return {
                "loss_retina_cls": cls_loss,
                "loss_retina_reg": reg_loss,
            }
        return retinanet_inference(
            anchor_list, logits, reg, image_sizes, self.statics
        )
