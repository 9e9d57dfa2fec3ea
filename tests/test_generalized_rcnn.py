import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
    GeneralizedRCNN,
    statics_from_cfg,
)


def tiny_cfg():
    cfg = get_default_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.CLS_AGNOSTIC_MASK = True
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 8
    cfg.MODEL.ROI_BOX_HEAD.LOSS_WEIGHT_BACKGROUND = 0.2
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 8
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 128
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 32
    cfg.TPU.MAX_GT = 4
    cfg.TPU.NMS_TILE = 64
    return cfg


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_cfg()
    model = GeneralizedRCNN(statics_from_cfg(cfg))
    images = jnp.zeros((1, 64, 64, 3))
    image_sizes = jnp.array([[64, 64]], jnp.int32)
    class_emb = jnp.asarray(
        np.random.RandomState(0).randn(8, 16), jnp.float32
    )
    targets = {
        "gt_boxes": jnp.array([[[4.0, 4.0, 30.0, 30.0]] * 4]),
        "gt_labels": jnp.ones((1, 4), jnp.int32),
        "gt_valid": jnp.array([[True, True, False, False]]),
        "gt_masks": jnp.ones((1, 4, 28, 28)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        images,
        image_sizes,
        class_emb,
        targets,
        train=True,
    )
    return model, params, images, image_sizes, class_emb, targets


def test_train_forward_losses(model_and_params):
    model, params, images, image_sizes, class_emb, targets = model_and_params
    out = model.apply(
        params,
        images,
        image_sizes,
        class_emb,
        targets,
        train=True,
        rngs={"sampler": jax.random.PRNGKey(2)},
    )
    expected = {
        "loss_objectness",
        "loss_rpn_box_reg",
        "loss_classifier",
        "loss_box_reg",
        "loss_mask",
    }
    assert set(out.losses.keys()) == expected
    for k, v in out.losses.items():
        assert v.shape == (), k
        assert np.isfinite(float(v)), k


def test_train_forward_jits_and_differentiates(model_and_params):
    model, params, images, image_sizes, class_emb, targets = model_and_params

    @jax.jit
    def loss_fn(p):
        out = model.apply(
            p, images, image_sizes, class_emb, targets, train=True,
            rngs={"sampler": jax.random.PRNGKey(3)},
        )
        return sum(out.losses.values())

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # some gradient must be nonzero
    assert any(float(jnp.sum(jnp.abs(x))) > 0 for x in flat)


def test_eval_forward_detections(model_and_params):
    model, params, images, image_sizes, class_emb, _ = model_and_params
    out = model.apply(
        params, images, image_sizes, class_emb, train=False
    )
    dets = out.detections
    assert dets.boxes.shape == (1, 8, 4)
    assert dets.scores.shape == (1, 8)
    assert dets.labels.shape == (1, 8)
    assert out.mask_probs is not None
    assert out.mask_probs.shape[0] == 1
    assert out.mask_probs.shape[1] == 8
    # boxes inside image bounds
    b = np.asarray(dets.boxes)
    assert (b >= -1e-3).all() and (b <= 64).all()


def test_gt_box_eval(model_and_params):
    model, params, images, image_sizes, class_emb, targets = model_and_params
    gt_eval = {
        "boxes": targets["gt_boxes"],
        "labels": targets["gt_labels"],
        "valid": targets["gt_valid"],
    }
    out = model.apply(
        params, images, image_sizes, class_emb, train=False,
        gt_eval=gt_eval,
    )
    dets = out.detections
    # surviving detections carry the GT labels with boosted scores
    v = np.asarray(dets.valid[0])
    assert v.any()
    assert (np.asarray(dets.scores[0])[v] > 1.0).all()
    assert set(np.asarray(dets.labels[0])[v]) <= {1}


def test_val_loss_step(model_and_params):
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
        build_val_loss_step,
    )

    model, params, images, image_sizes, class_emb, targets = model_and_params
    val_step = build_val_loss_step(model, "GeneralizedRCNN")
    batch = {
        "images": images,
        "image_sizes": image_sizes,
        "class_embeddings": class_emb,
        **targets,
    }
    out = val_step(params, batch)
    assert "val_total_loss" in out
    assert np.isfinite(float(out["val_total_loss"]))


def test_teacher_pseudo_branch(model_and_params):
    model, params, images, image_sizes, class_emb, _ = model_and_params
    out = model.apply(
        params,
        images,
        image_sizes,
        class_emb,
        method=GeneralizedRCNN.run_teacher_pseudo_branch,
    )
    assert out.embeddings.shape == (1, 32, 16)
    assert out.class_logits.shape == (1, 32, 8)
    assert out.proposals.boxes.shape == (1, 32, 4)
