#!/usr/bin/env python
"""Dataset-free smoke training: train the open-vocab Mask R-CNN on a
synthetic fixed batch and report the loss curve.  Validates the full
stack (model, sampling, losses, optimizer, schedule, mesh) on any
backend in minutes.

  python tools/smoke_train.py [steps] [--cpu]
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    steps = 30
    for a in sys.argv[1:]:
        if a == "--cpu":
            import jax

            jax.config.update("jax_platforms", "cpu")
        elif a.isdigit():
            steps = int(a)
    import jax
    import jax.numpy as jnp

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

    cfg = get_default_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.CLS_AGNOSTIC_MASK = True
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 128
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 32
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 0
    cfg.TPU.MAX_GT = 4
    cfg.TPU.NMS_TILE = 64
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_ITERS = 5
    cfg.SOLVER.STEPS = (10**9,)
    cfg.SOLVER.CLIP_GRAD_NORM_AT = 10.0

    model = GeneralizedRCNN(statics_from_cfg(cfg))
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32),
        "image_sizes": jnp.array([[128, 128]], jnp.int32),
        "class_embeddings": jnp.asarray(rng.randn(8, 32), jnp.float32),
        "gt_boxes": jnp.array(
            [[[10.0, 10.0, 60.0, 60.0], [70.0, 70.0, 120.0, 120.0],
              [0.0] * 4, [0.0] * 4]]
        ),
        "gt_labels": jnp.array([[1, 2, 0, 0]], jnp.int32),
        "gt_valid": jnp.array([[True, True, False, False]]),
        "gt_masks": jnp.ones((1, 4, 28, 28)),
    }
    params = jax.jit(
        lambda r, im, sz, ce, tg: model.init(r, im, sz, ce, tg, train=True)
    )(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        batch["images"],
        batch["image_sizes"],
        batch["class_embeddings"],
        {k: batch[k] for k in ("gt_boxes", "gt_labels", "gt_valid",
                               "gt_masks")},
    )
    tx, _ = make_optimizer(
        cfg, params["params"], frozen_prefixes_from_cfg(cfg)
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(7))
    step = jax.jit(build_train_step(model, tx, "GeneralizedRCNN"))

    first = None
    for i in range(steps):
        state, metrics = step(state, batch)
        loss = float(metrics["total_loss"])
        if first is None:
            first = loss
        if i % 5 == 0 or i == steps - 1:
            print(f"step {i:3d}  total_loss {loss:.4f}")
    print(
        f"done: loss {first:.4f} -> {loss:.4f} "
        f"({'improved' if loss < first else 'NO IMPROVEMENT'})"
    )


if __name__ == "__main__":
    main()
