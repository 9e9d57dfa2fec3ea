"""RoIHeadsBundle: extractor + box predictor + mask predictor as one
reusable module — the unit the student-teacher model instantiates twice
(frozen teacher / trainable student, reference
modeling/detector/st_generalized_rcnn.py:40-44 builds two
``build_roi_heads``)."""

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..resnet import ResNetRoIHead
from ..roi_heads.box_head import BoxPredictor
from ..roi_heads.mask_head import MaskPredictor
from ..roi_heads.pooler import pool_rois
from ..detector.statics import RCNNStatics


def _dtype(s: RCNNStatics):
    return jnp.bfloat16 if s.compute_dtype == "bfloat16" else jnp.float32


class RoIHeadsBundle(nn.Module):
    statics: RCNNStatics
    uncertainty: bool = False

    def setup(self):
        s = self.statics
        dtype = _dtype(s)
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
                uncertainty=self.uncertainty,
                sigma_max=getattr(s, "uncertainty_sigma_max", 0.0),
                dtype=dtype,
            )

    def extract(self, feats, boxes):
        """Pool [B, S, 4] boxes and run the shared C5 extractor.
        Returns [B*S, 7, 7, 2048]."""
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

    def box_outputs(self, x, class_embeddings, class_valid=None):
        vec = jnp.mean(x, axis=(1, 2))
        logits, deltas, emb = self.box_predictor(
            vec, class_embeddings, class_valid
        )
        return logits, deltas, emb

    def mask_outputs(self, x, compute_uncertain=False, train=False):
        return self.mask_predictor(
            x,
            compute_uncertain=compute_uncertain,
            train=train,
            num_samples=getattr(self.statics, "uncertainty_samples", 1),
        )
