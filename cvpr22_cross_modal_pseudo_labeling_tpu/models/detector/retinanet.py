"""Engine-facing RetinaNet detector.

The reference reaches RetinaNet through MODEL.RETINANET_ON inside the
GeneralizedRCNN skeleton (modeling/rpn/rpn.py:204-205 build_retinanet
dispatch, RPN_ONLY); this adapter gives the standalone RetinaNet module
(models/rpn/retinanet.py) the GeneralizedRCNN call surface so the
train/eval engine and CLIs drive it unchanged."""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..rpn.retinanet import RetinaNet, RetinaNetStatics
from .generalized_rcnn import RCNNEvalOutput, RCNNTrainOutput


class RetinaNetDetector(nn.Module):
    statics: RetinaNetStatics
    backbone_depth: str = "R-50"
    dtype: Any = jnp.float32

    def setup(self):
        self.net = RetinaNet(
            self.statics,
            backbone_depth=self.backbone_depth,
            dtype=self.dtype,
        )

    def __call__(
        self,
        images,
        image_sizes,
        class_embeddings=None,  # unused: fixed-vocabulary classifier
        targets=None,
        train: bool = False,
        gt_eval=None,
    ):
        if train:
            losses = self.net(images, image_sizes, targets, train=True)
            return RCNNTrainOutput(losses, {})
        dets = self.net(images, image_sizes, train=False)
        return RCNNEvalOutput(dets, None)
