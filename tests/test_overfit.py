"""End-to-end training dynamics: a tiny GeneralizedRCNN must overfit a
single synthetic batch (losses decrease substantially).  This is the
functional replacement for the reference's 'periodic in-training
evaluation as de-facto integration test' strategy (SURVEY.md 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.optimizer import (
    frozen_prefixes_from_cfg,
    make_optimizer,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
    build_train_step,
    create_train_state,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
    GeneralizedRCNN,
    statics_from_cfg,
)


def test_overfit_single_batch():
    cfg = get_default_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.CLS_AGNOSTIC_MASK = True
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 16
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 0
    cfg.TPU.MAX_GT = 2
    cfg.TPU.NMS_TILE = 64
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_ITERS = 5
    cfg.SOLVER.STEPS = (10000,)
    cfg.SOLVER.CLIP_GRAD_NORM_AT = 10.0

    model = GeneralizedRCNN(statics_from_cfg(cfg))
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32),
        "image_sizes": jnp.array([[64, 64]], jnp.int32),
        "class_embeddings": jnp.asarray(rng.randn(4, 16), jnp.float32),
        "gt_boxes": jnp.array(
            [[[8.0, 8.0, 30.0, 30.0], [36.0, 36.0, 58.0, 58.0]]]
        ),
        "gt_labels": jnp.array([[1, 2]], jnp.int32),
        "gt_valid": jnp.ones((1, 2), bool),
        "gt_masks": jnp.ones((1, 2, 28, 28)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        batch["images"],
        batch["image_sizes"],
        batch["class_embeddings"],
        {k: batch[k] for k in ("gt_boxes", "gt_labels", "gt_valid", "gt_masks")},
        train=True,
    )
    tx, _ = make_optimizer(
        cfg, params["params"], frozen_prefixes_from_cfg(cfg)
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(7))
    step = jax.jit(build_train_step(model, tx, "GeneralizedRCNN"))

    losses = []
    for _ in range(40):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.all(np.isfinite(losses)), losses
    # the model must fit the fixed batch: large relative improvement
    assert last < 0.5 * first, (first, last, losses[::8])
