"""GeneralizedRCNN — backbone -> RPN -> RoI heads, one jittable module.

TPU re-design of reference
modeling/detector/generalized_rcnn.py:16-73 plus the CombinedROIHeads
plumbing (roi_heads/roi_heads.py:11-102): the whole forward — including
proposal NMS, RoI sampling, pooling and both heads — traces into a
single XLA program with static shapes.  Per-image Python loops of the
reference become vmap; train/eval are two compilations of the same
module (``train`` is a static argument).

Modes:
  * train=True  -> dict of losses (plus aux info).
  * train=False -> Detections (+ mask probabilities when MASK_ON).
  * run_teacher_pseudo_branch: bbox_only teacher forward used by the
    student-teacher model (st_generalized_rcnn.py:218-275) — returns
    per-proposal region embeddings and, optionally, teacher masks for
    chosen boxes.
"""

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.box_coder import decode_boxes
from ...core.boxes import clip_to_image
from ..backbone import ResNetBackbone, ResNetFPNBackbone, device_normalize
from ..resnet import RESNET_STAGES, ResNetRoIHead
from ..rpn.anchors import anchor_visibility, build_anchors_for_levels
from ..rpn.rpn import (
    RPNHead,
    RPNProposals,
    flatten_rpn_outputs,
    rpn_loss,
    select_proposals_multi_level,
)
from ..roi_heads.box_head import (
    BoxPredictor,
    Detections,
    box_head_loss,
    postprocess_boxes,
    subsample_rois,
)
from ..roi_heads.mask_head import (
    MaskPredictor,
    mask_head_inference,
    mask_head_loss,
)
from ..roi_heads.pooler import pool_rois
from .statics import RCNNStatics


class RCNNTrainOutput(NamedTuple):
    losses: Dict[str, jnp.ndarray]
    info: Dict[str, jnp.ndarray]


class RCNNEvalOutput(NamedTuple):
    detections: Detections
    mask_probs: Optional[jnp.ndarray]  # [B, D, M2, M2]
    # KEYPOINT_ON: per-detection keypoints [B, D, K, 3] (x, y, score)
    keypoints: Optional[jnp.ndarray] = None


class TeacherPseudoOutput(NamedTuple):
    proposals: RPNProposals  # [B, P]
    embeddings: jnp.ndarray  # [B, P, emb_dim] region embeddings
    class_logits: jnp.ndarray  # [B, P, C] vs the injected vocabulary
    boxes: jnp.ndarray  # [B, P, 4] teacher-regressed + clipped boxes


def _dtype(s: RCNNStatics):
    return jnp.bfloat16 if s.compute_dtype == "bfloat16" else jnp.float32


class GeneralizedRCNN(nn.Module):
    statics: RCNNStatics

    def setup(self):
        s = self.statics
        dtype = _dtype(s)
        r = RESNET_STAGES
        common = dict(
            stem_out_channels=s.stem_out_channels,
            res2_out_channels=s.res2_out_channels,
            num_groups=s.num_groups,
            width_per_group=s.width_per_group,
            stride_in_1x1=s.stride_in_1x1,
            s2d_stem=s.s2d_stem,
            dtype=dtype,
        )
        if s.conv_body.endswith("-C4"):
            self.backbone = ResNetBackbone(
                depth=s.conv_body[:-3], num_stages=3, **common
            )
        elif s.conv_body.endswith("-C5"):
            self.backbone = ResNetBackbone(
                depth=s.conv_body[:-3], num_stages=4,
                res5_dilation=s.res5_dilation, **common
            )
        else:
            self.backbone = ResNetFPNBackbone(
                depth=s.conv_body[: -len("-FPN")],
                out_channels=s.backbone_out_channels,
                **common,
            )
        num_cell_anchors = len(s.aspect_ratios) * (
            len(s.anchor_sizes) if len(s.anchor_stride) == 1 else 1
        )
        self.rpn_head = RPNHead(
            in_channels=s.backbone_out_channels,
            num_anchors=num_cell_anchors,
            dtype=dtype,
        )
        self.roi_extractor = ResNetRoIHead(
            in_channels=s.backbone_out_channels,
            num_groups=s.num_groups,
            width_per_group=s.width_per_group,
            stride_in_1x1=s.stride_in_1x1,
            dilation=s.res5_dilation,
            prestrided=s.pool_prestride,
            dtype=dtype,
        )
        self.box_predictor = BoxPredictor(
            embedding_based=s.embedding_based,
            emb_dim=s.emb_dim,
            num_classes=s.num_classes,
            cls_agnostic_bbox_reg=s.cls_agnostic_bbox_reg,
            dtype=dtype,
        )
        if s.mask_on:
            self.mask_predictor = MaskPredictor(
                num_classes=2 if s.cls_agnostic_mask else s.num_classes,
                dim_reduced=s.mask_dim_reduced,
                uncertainty=s.uncertainty,
                sigma_max=getattr(s, "uncertainty_sigma_max", 0.0),
                dtype=dtype,
            )
        if s.keypoint_on:
            # MODEL.KEYPOINT_ON dispatch (reference roi_heads.py:57-62);
            # shares the box RoI features (SHARE_BOX_FEATURE_EXTRACTOR)
            from ..roi_heads.keypoint_head import KeypointPredictor

            self.keypoint_predictor = KeypointPredictor(
                num_keypoints=s.num_keypoints, dtype=dtype
            )
        if s.wsddn:
            # MODEL.ROI_BOX_HEAD.WSDDN replaces the standard box head
            # (reference box_head.py:88-89)
            from ..roi_heads.wsddn_head import WSDDNHead

            self.wsddn_head = WSDDNHead(num_classes=s.num_classes)

    # -- shared pieces ---------------------------------------------------

    def _anchors(self, feature_shapes):
        s = self.statics
        return build_anchors_for_levels(
            feature_shapes, s.anchor_stride, s.anchor_sizes, s.aspect_ratios
        )

    def _rpn_forward(self, images, image_sizes, train: bool):
        s = self.statics
        feats = self.backbone(images)
        obj_l, reg_l = self.rpn_head(feats)
        objectness, box_reg = flatten_rpn_outputs(obj_l, reg_l)
        anchor_list = self._anchors([f.shape[1:3] for f in feats])
        anchors = jnp.concatenate(anchor_list, axis=0)

        pre = s.rpn_pre_nms_train if train else s.rpn_pre_nms_test
        post = s.rpn_post_nms_train if train else s.rpn_post_nms_test
        # C4/C5 = single level; FPN = per-level top-k + NMS then FPN
        # top-N (reference rpn/inference.py:76-152), shared with the ST
        # meta-architecture via select_proposals_multi_level
        proposals = select_proposals_multi_level(
            anchor_list,
            objectness.astype(jnp.float32),
            box_reg.astype(jnp.float32),
            image_sizes,
            pre,
            post,
            s.rpn_nms_thresh,
            s.rpn_min_size,
            s.nms_tile,
            fpn_post_nms_top_n=(
                s.fpn_post_nms_train if train else s.fpn_post_nms_test
            ),
            fpn_post_nms_per_batch=train and s.fpn_post_nms_per_batch,
            per_batch_groups=s.fpn_per_batch_groups,
        )
        return feats, objectness, box_reg, anchors, proposals

    def _extract_box_features(self, feats, boxes):
        s = self.statics
        pooled = pool_rois(
            [f.astype(jnp.float32) for f in feats],
            boxes,
            (s.pooler_resolution, s.pooler_resolution),
            s.pooler_scales,
            s.pooler_sampling_ratio,
            bin_stride=2 if s.pool_prestride else 1,
        )
        return self.roi_extractor(pooled.astype(_dtype(s)))

    # -- main forward ----------------------------------------------------

    def __call__(
        self,
        images: jnp.ndarray,
        image_sizes: jnp.ndarray,
        class_embeddings: Optional[jnp.ndarray] = None,
        targets: Optional[Dict[str, jnp.ndarray]] = None,
        train: bool = False,
        compute_uncertain: bool = False,
        pseudo_sample_weights: Optional[jnp.ndarray] = None,
        lambda_mask: float = 1.0,
        gt_eval: Optional[Dict[str, jnp.ndarray]] = None,
        class_valid: Optional[jnp.ndarray] = None,
    ):
        # class_valid [C] bool: row mask for class tables padded to a
        # multiple of the 'model' mesh axis (vocab-parallel sharding at
        # arbitrary vocabulary sizes — engine/train_step.pad_vocab_tables)
        images = device_normalize(
            images, image_sizes, self.statics.pixel_mean,
            self.statics.pixel_std, self.statics.to_bgr255,
        )
        if train:
            return self.forward_train(
                images, image_sizes, class_embeddings, targets,
                compute_uncertain=compute_uncertain,
                pseudo_sample_weights=pseudo_sample_weights,
                class_valid=class_valid,
            )
        return self.forward_eval(
            images, image_sizes, class_embeddings, gt_eval=gt_eval,
            class_valid=class_valid,
        )

    def forward_train(
        self,
        images,
        image_sizes,
        class_embeddings,
        targets,
        compute_uncertain: bool = False,
        pseudo_sample_weights=None,
        class_valid=None,
    ) -> RCNNTrainOutput:
        s = self.statics
        feats, objectness, box_reg, anchors, proposals = self._rpn_forward(
            images, image_sizes, train=True
        )
        gt_boxes = targets["gt_boxes"]
        gt_labels = targets["gt_labels"]
        gt_valid = targets["gt_valid"]

        losses: Dict[str, jnp.ndarray] = {}
        info: Dict[str, jnp.ndarray] = {}

        if not s.rpn_dont_train:
            vis = jax.vmap(
                lambda sz: anchor_visibility(anchors, sz, s.straddle_thresh)
            )(image_sizes)
            obj_loss, rpn_box_loss = rpn_loss(
                anchors,
                vis,
                objectness.astype(jnp.float32),
                box_reg.astype(jnp.float32),
                gt_boxes,
                gt_valid,
                self.make_rng("sampler"),
                s.rpn_fg_iou,
                s.rpn_bg_iou,
                s.rpn_batch_per_image,
                s.rpn_positive_fraction,
            )
            losses["loss_objectness"] = obj_loss
            losses["loss_rpn_box_reg"] = rpn_box_loss

        if s.rpn_only:
            return RCNNTrainOutput(losses, info)

        if s.wsddn:
            # weakly-supervised path: no RoI subsampling — the WSDDN
            # head scores raw proposals and trains on image-level
            # multi-labels (wsddn_head/__init__.py:29-64)
            x = self._extract_box_features(feats, proposals.boxes)
            vec = jnp.mean(x, axis=(1, 2))
            b, p = proposals.boxes.shape[:2]
            _, image_scores = self.wsddn_head(
                vec.astype(jnp.float32).reshape(b, p, -1), proposals.valid
            )
            from ..roi_heads.wsddn_head import wsddn_loss

            image_labels = targets.get("image_labels")
            if image_labels is None:
                # derive the multi-hot image-level labels from instance
                # GT (the weakly-supervised protocol only assumes which
                # classes appear, reference wsddn docstring "image-level
                # labels in weakly supervised settings")
                # class L occupies column L (column 0 = background,
                # which wsddn_inference skips) so train/eval indexing
                # agree
                c = image_scores.shape[-1]
                oh = (
                    jax.nn.one_hot(
                        jnp.clip(targets["gt_labels"], 0, c - 1), c
                    )
                    * targets["gt_valid"][..., None]
                )
                image_labels = jnp.max(oh, axis=1)
                image_labels = image_labels.at[:, 0].set(0.0)
            losses["loss_classifier"] = wsddn_loss(
                image_scores,
                image_labels.astype(jnp.float32),
                background_weight=s.bg_weight,
            )
            return RCNNTrainOutput(losses, info)

        # add_gt_proposals (rpn/inference.py:53-74)
        all_boxes = jnp.concatenate([proposals.boxes, gt_boxes], axis=1)
        all_valid = jnp.concatenate([proposals.valid, gt_valid], axis=1)

        sampled = subsample_rois(
            all_boxes,
            all_valid,
            gt_boxes,
            gt_labels,
            gt_valid,
            self.make_rng("sampler"),
            s.roi_batch_per_image,
            s.roi_positive_fraction,
            s.roi_fg_iou,
            s.roi_bg_iou,
            s.reg_weights,
        )
        x = self._extract_box_features(feats, sampled.boxes)
        vec = jnp.mean(x, axis=(1, 2))
        logits, deltas, emb = self.box_predictor(
            vec, class_embeddings, class_valid
        )
        cls_loss, box_loss = box_head_loss(
            logits.astype(jnp.float32),
            deltas.astype(jnp.float32),
            sampled,
            bg_weight=s.bg_weight,
            cls_agnostic_bbox_reg=s.cls_agnostic_bbox_reg,
            sample_weights=pseudo_sample_weights,
        )
        losses["loss_classifier"] = cls_loss
        losses["loss_box_reg"] = box_loss

        if s.mask_on:
            # mask head on the leading (positives-first) slice only
            cap = min(s.mask_pos_cap, s.roi_batch_per_image)
            b = images.shape[0]
            x_mask = x.reshape(b, -1, *x.shape[1:])[:, :cap].reshape(
                -1, *x.shape[1:]
            )
            sampled_mask = sampled.head(cap)
            mask_logits, scale = self.mask_predictor(
                x_mask,
                compute_uncertain=compute_uncertain,
                train=True,
                num_samples=getattr(s, "uncertainty_samples", 1),
            )
            losses["loss_mask"] = mask_head_loss(
                mask_logits.astype(jnp.float32),
                sampled_mask,
                targets["gt_masks"],
                gt_boxes,
                cls_agnostic_mask=s.cls_agnostic_mask,
                estimator=getattr(s, "uncertainty_estimator", "sampled_bce"),
            )
            if scale is not None:
                pos = (sampled.is_pos & sampled.valid).reshape(-1)
                avg_unc = jnp.sum(
                    jnp.mean(scale[..., 0], axis=(1, 2))
                    * pos.astype(jnp.float32)
                ) / jnp.maximum(jnp.sum(pos), 1.0)
                info["avg_uncertain"] = avg_unc

        if s.keypoint_on and "gt_keypoints" in targets:
            # keypoint branch on the positives-first slice, sharing the
            # box RoI features (roi_heads.py:57-62 + keypoint_head)
            from ..roi_heads.keypoint_head import keypoint_loss

            cap = min(s.mask_pos_cap, s.roi_batch_per_image)
            b = images.shape[0]
            x_kp = x.reshape(b, -1, *x.shape[1:])[:, :cap].reshape(
                -1, *x.shape[1:]
            )
            sampled_kp = sampled.head(cap)
            kp_logits = self.keypoint_predictor(x_kp)
            # matched gt keypoints per sampled roi
            gt_kp = targets["gt_keypoints"]  # [B, G, K, 3]
            kp = jax.vmap(lambda g, m: g[m])(
                gt_kp, sampled_kp.matched_gt
            ).reshape(-1, gt_kp.shape[2], 3)
            losses["loss_kp"] = keypoint_loss(
                kp_logits.astype(jnp.float32),
                kp,
                sampled_kp.boxes.reshape(-1, 4),
                (sampled_kp.is_pos & sampled_kp.valid).reshape(-1),
            )
        return RCNNTrainOutput(losses, info)

    def forward_eval(
        self,
        images,
        image_sizes,
        class_embeddings,
        gt_eval: Optional[Dict[str, jnp.ndarray]] = None,
        class_valid=None,
    ) -> RCNNEvalOutput:
        """gt_eval (MODEL.GT_BOX_EVAL, roi_heads.py:31-42): when given
        {'boxes': [B,G,4], 'labels': [B,G], 'valid': [B,G]}, GT boxes
        replace proposals and the postprocessor keeps exactly each
        box's own label (inference.py:82-89)."""
        from ..rpn.rpn import RPNProposals

        s = self.statics
        feats, _, _, _, proposals = self._rpn_forward(
            images, image_sizes, train=False
        )
        if s.rpn_only:
            # RPN_ONLY eval returns raw proposals (generalized_rcnn.py
            # RPN_ONLY path); evaluation runs box-proposal AR
            # (data/evaluation/box_proposals.py)
            dets = Detections(
                boxes=proposals.boxes,
                scores=proposals.scores,
                labels=jnp.zeros(proposals.scores.shape, jnp.int32),
                valid=proposals.valid,
            )
            return RCNNEvalOutput(dets, None)
        override_labels = None
        if gt_eval is not None:
            proposals = RPNProposals(
                boxes=gt_eval["boxes"],
                scores=jnp.ones(gt_eval["boxes"].shape[:2], jnp.float32),
                valid=gt_eval["valid"],
            )
            override_labels = jnp.where(
                gt_eval["valid"], gt_eval["labels"].astype(jnp.int32), -1
            )
        x = self._extract_box_features(feats, proposals.boxes)
        vec = jnp.mean(x, axis=(1, 2))
        b, p = proposals.boxes.shape[:2]
        if s.wsddn:
            from ..roi_heads.wsddn_head import wsddn_inference

            proposal_scores, _ = self.wsddn_head(
                vec.astype(jnp.float32).reshape(b, p, -1), proposals.valid
            )
            dets = wsddn_inference(
                proposal_scores,
                proposals.boxes,
                proposals.valid,
                score_thresh=s.score_thresh,
                nms_thresh=s.nms_thresh,
                detections_per_img=s.detections_per_img,
                nms_tile=s.nms_tile,
            )
            return RCNNEvalOutput(dets, None)
        logits, deltas, _ = self.box_predictor(
            vec, class_embeddings, class_valid
        )
        dets = postprocess_boxes(
            logits.astype(jnp.float32).reshape(b, p, -1),
            deltas.astype(jnp.float32).reshape(b, p, -1),
            proposals.boxes,
            proposals.valid,
            image_sizes,
            s.score_thresh,
            s.nms_thresh,
            s.detections_per_img,
            pre_nms_candidates=min(
                10 * s.detections_per_img,
                p * (max(logits.shape[-1] - 1, 1)),
            ),
            reg_weights=s.reg_weights,
            cls_agnostic_bbox_reg=s.cls_agnostic_bbox_reg,
            nms_tile=s.nms_tile,
            gt_override_labels=override_labels,
        )
        mask_probs = None
        if s.mask_on:
            x2 = self._extract_box_features(feats, dets.boxes)
            mask_logits, _ = self.mask_predictor(x2, compute_uncertain=False)
            probs = mask_head_inference(
                mask_logits.astype(jnp.float32),
                dets.labels.reshape(-1),
                s.cls_agnostic_mask,
            )
            m2 = probs.shape[-1]
            mask_probs = probs.reshape(b, -1, m2, m2)
        keypoints = None
        if s.keypoint_on:
            from ..roi_heads.keypoint_head import keypoint_inference

            x_kp = self._extract_box_features(feats, dets.boxes)
            kp_logits = self.keypoint_predictor(x_kp)
            xy, kp_scores = keypoint_inference(
                kp_logits.astype(jnp.float32), dets.boxes.reshape(-1, 4)
            )
            k = xy.shape[1]
            keypoints = jnp.concatenate(
                [xy, kp_scores[..., None]], axis=-1
            ).reshape(b, -1, k, 3)
        return RCNNEvalOutput(dets, mask_probs, keypoints)

    # -- teacher path for pseudo-labeling --------------------------------

    def run_teacher_pseudo_branch(
        self, images, image_sizes, class_embeddings
    ) -> TeacherPseudoOutput:
        """bbox_only, eval-mode forward that keeps the proposal/box
        alignment (is_teacher postprocessor skips filtering —
        box_head/inference.py:97-98) and returns emb_pred region
        embeddings (st_generalized_rcnn.py:226-228).  ``boxes`` are the
        teacher-regressed proposals: the is_teacher postprocessor still
        runs box_coder.decode on the cls-agnostic last 4 delta channels
        and clips to the image (box_head/inference.py:72-99)."""
        feats, _, _, _, proposals = self._rpn_forward(
            images, image_sizes, train=False
        )
        x = self._extract_box_features(feats, proposals.boxes)
        vec = jnp.mean(x, axis=(1, 2))
        logits, deltas, emb = self.box_predictor(vec, class_embeddings)
        b, p = proposals.boxes.shape[:2]
        deltas = deltas.astype(jnp.float32).reshape(b, p, -1)[..., -4:]
        reg_boxes = decode_boxes(
            deltas, proposals.boxes, self.statics.reg_weights
        )
        reg_boxes = clip_to_image(reg_boxes, image_sizes)
        return TeacherPseudoOutput(
            proposals=proposals,
            embeddings=emb.astype(jnp.float32).reshape(b, p, -1),
            class_logits=logits.astype(jnp.float32).reshape(b, p, -1),
            boxes=reg_boxes,
        )

    def predict_masks_for_boxes(self, images, image_sizes, boxes):
        """Teacher mask head on chosen pseudo boxes
        (st_generalized_rcnn.py:264-272): returns [B, P, M2, M2] mask
        probabilities (cls-agnostic channel)."""
        s = self.statics
        images = device_normalize(
            images, image_sizes, s.pixel_mean, s.pixel_std, s.to_bgr255
        )
        feats = self.backbone(images)
        x = self._extract_box_features(feats, boxes)
        mask_logits, _ = self.mask_predictor(x, compute_uncertain=False)
        probs = mask_head_inference(
            mask_logits.astype(jnp.float32),
            jnp.ones((x.shape[0],), jnp.int32),
            s.cls_agnostic_mask,
        )
        b = boxes.shape[0]
        m2 = probs.shape[-1]
        return probs.reshape(b, -1, m2, m2)
