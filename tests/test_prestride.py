"""POOL_PRESTRIDE equivalence: pooling only the even bins and running
the C5 head with first_stride 1 must reproduce the full-grid
stride-2 pipeline (the stride-2 stride_in_1x1 1x1 convs read exactly
those positions)."""

import jax
import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
    GeneralizedRCNN,
    statics_from_cfg,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.ops.roi_align_mxu import (
    roi_align_mxu,
)


def test_bin_stride_matches_sliced_full_grid():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(2, 16, 20, 8), jnp.float32)
    boxes = jnp.asarray(
        [[[4.0, 4.0, 60.0, 50.0], [0.0, 0.0, 300.0, 250.0]]] * 2,
        jnp.float32,
    )
    full = roi_align_mxu(feat, boxes, (14, 14), 1.0 / 16, 0)
    strided = roi_align_mxu(feat, boxes, (14, 14), 1.0 / 16, 0, bin_stride=2)
    np.testing.assert_allclose(
        np.asarray(strided), np.asarray(full)[:, :, ::2, ::2], atol=1e-6
    )
    assert strided.shape[2:4] == (7, 7)


def _tiny_cfg(prestride: bool):
    cfg = get_default_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.CLS_AGNOSTIC_MASK = True
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 16
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 8
    cfg.MODEL.ROI_HEADS.SCORE_THRESH = 0.0
    cfg.TPU.NMS_TILE = 64
    cfg.TPU.POOL_PRESTRIDE = prestride
    return cfg


def test_model_outputs_identical_with_and_without_prestride():
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    sizes = jnp.array([[64, 64]], jnp.int32)
    class_emb = jnp.asarray(rng.randn(8, 16), jnp.float32)

    outs = {}
    for flag in (False, True):
        model = GeneralizedRCNN(statics_from_cfg(_tiny_cfg(flag)))
        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            images, sizes, class_emb, train=False,
        )
        outs[flag] = model.apply(
            params, images, sizes, class_emb, train=False
        )
    np.testing.assert_allclose(
        np.asarray(outs[True].detections.boxes),
        np.asarray(outs[False].detections.boxes),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(outs[True].detections.scores),
        np.asarray(outs[False].detections.scores),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(outs[True].mask_probs),
        np.asarray(outs[False].mask_probs),
        atol=1e-5,
    )
