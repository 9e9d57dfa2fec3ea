#!/usr/bin/env python
"""Per-component timing of the train step on the attached TPU chip.

Times (separately jitted, bench shapes): backbone forward, RPN forward +
proposal selection, RoI pooling + C5 extraction, the full loss forward,
and the full train step — to locate where step time goes before kernel
work.  Writes one JSON line per component.
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def _sync(out):
    """Force full materialization: under the remote tunnel,
    block_until_ready can return before execution completes — pulling a
    scalar to the host cannot."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.optimizer import (
        frozen_prefixes_from_cfg,
        make_optimizer,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
        build_loss_fn,
        build_train_step,
        create_train_state,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
        GeneralizedRCNN,
        statics_from_cfg,
    )

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h, w = 800, 1344
    cfg = get_default_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.CLS_AGNOSTIC_MASK = True
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 768
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 49
    cfg.MODEL.ROI_BOX_HEAD.LOSS_WEIGHT_BACKGROUND = 0.2
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 2
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.MAX_GT = 20

    model = GeneralizedRCNN(statics_from_cfg(cfg))
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        "image_sizes": jnp.tile(jnp.array([[800, 1333]], jnp.int32), (b, 1)),
        "class_embeddings": jnp.asarray(rng.randn(49, 768), jnp.float32),
        "gt_boxes": jnp.asarray(
            np.concatenate(
                [rng.uniform(0, 600, (b, 20, 2)),
                 rng.uniform(650, 1300, (b, 20, 2))], axis=-1
            ),
            jnp.float32,
        ),
        "gt_labels": jnp.asarray(rng.randint(1, 49, (b, 20)), jnp.int32),
        "gt_valid": jnp.ones((b, 20), bool),
        "gt_masks": jnp.asarray(
            (rng.rand(b, 20, 28, 28) > 0.5), jnp.float32
        ),
    }
    params = jax.jit(
        lambda r, im, sz, ce, tg: model.init(r, im, sz, ce, tg, train=True)
    )(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        batch["images"][:1],
        batch["image_sizes"][:1],
        batch["class_embeddings"],
        {k: batch[k][:1] for k in ("gt_boxes", "gt_labels", "gt_valid",
                                   "gt_masks")},
    )

    results = {}

    def emit(k, v):
        results[k] = v
        print(json.dumps({k: round(v, 2)}), flush=True)

    # backbone forward
    bb = jax.jit(
        lambda p, im: model.apply(p, im, method=lambda m, x: m.backbone(x))
    )
    emit("backbone_fwd_ms", timed(bb, params, batch["images"]) * 1e3)

    # full rpn forward (backbone + head + anchors + NMS selection)
    rpnf = jax.jit(
        lambda p, im, sz: model.apply(
            p, im, sz, True,
            method=lambda m, images, sizes, train: m._rpn_forward(
                images, sizes, train
            )[4],
        )
    )
    emit(
        "backbone_plus_rpn_select_ms",
        timed(rpnf, params, batch["images"], batch["image_sizes"]) * 1e3,
    )

    # pooling + C5 extraction on 512 random rois per image
    rois = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 600, (b, 512, 2)),
             rng.uniform(650, 1300, (b, 512, 2))], axis=-1
        ),
        jnp.float32,
    )

    def pool_extract(p, im, rr):
        def run(m, images, boxes):
            feats = m.backbone(images)
            return m._extract_box_features(feats, boxes)

        return model.apply(p, im, rr, method=run)

    pe = jax.jit(pool_extract)
    emit(
        "backbone_pool_c5_ms", timed(pe, params, batch["images"], rois) * 1e3
    )

    # loss forward only
    loss_fn = build_loss_fn(model, "GeneralizedRCNN")
    lf = jax.jit(lambda p, bt: loss_fn(p, bt, jax.random.PRNGKey(0))[0])
    emit("loss_fwd_ms", timed(lf, params, batch) * 1e3)

    # full train step
    tx, _ = make_optimizer(
        cfg, params["params"], frozen_prefixes_from_cfg(cfg)
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(7))
    step = jax.jit(build_train_step(model, tx, "GeneralizedRCNN"))
    state, m0 = step(state, batch)
    jax.block_until_ready(m0["total_loss"])
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, m0 = step(state, batch)
    jax.block_until_ready(m0["total_loss"])
    emit("full_step_ms", (time.perf_counter() - t0) / n * 1e3)
    emit("imgs_per_sec", b / (results["full_step_ms"] / 1e3))

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
