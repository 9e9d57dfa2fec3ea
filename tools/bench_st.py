#!/usr/bin/env python
"""Benchmark the student-teacher distillation step at production shapes
on the attached TPU chip: teacher pseudo-labeling (RPN + region
embeddings + noun alignment + teacher masks) fused with the student
update.  Reports imgs/sec and teacher pseudo-masks/sec (BASELINE.json's
secondary metric)."""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


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
        build_train_step,
        create_train_state,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.st_generalized_rcnn import (
        STGeneralizedRCNN,
        st_statics_from_cfg,
    )

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    h, w = 800, 1344
    nw, t = 16, 8  # caption nouns per image, wordpieces per noun

    cfg = get_default_cfg()
    cfg.MODEL.META_ARCHITECTURE = "STGeneralizedRCNN"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.UNCERTAINTY = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.CLS_AGNOSTIC_MASK = True
    cfg.MODEL.LAMBDA_PSEUDO_LABEL = 0.1
    cfg.MODEL.RPN.DONT_TRAIN = True
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 768
    cfg.MODEL.ROI_BOX_HEAD.LOSS_WEIGHT_BACKGROUND = 0.2
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 2
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.MAX_GT = 20
    cfg.TPU.MAX_CAP_NOUNS = nw

    model = STGeneralizedRCNN(st_statics_from_cfg(cfg))
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        "image_sizes": jnp.tile(
            jnp.array([[800, 1333]], jnp.int32), (b, 1)
        ),
        "cap_mask": jnp.ones((b,), bool),
        "det_mask": jnp.ones((b,), bool),
        "cap_tok_ids": jnp.asarray(
            rng.randint(5, 30522, (b, nw, t)), jnp.int32
        ),
        "cap_tok_mask": jnp.ones((b, nw, t), jnp.int32),
        "cap_word_valid": jnp.ones((b, nw), bool),
        "cap_labels": jnp.asarray(rng.randint(0, 1203, (b, nw)), jnp.int32),
        "gt_boxes": jnp.asarray(
            np.concatenate(
                [rng.uniform(0, 600, (b, 20, 2)),
                 rng.uniform(650, 1300, (b, 20, 2))], axis=-1
            ), jnp.float32,
        ),
        "gt_labels": jnp.asarray(rng.randint(1, 49, (b, 20)), jnp.int32),
        "gt_valid": jnp.ones((b, 20), bool),
        "gt_masks": jnp.asarray(
            (rng.rand(b, 20, 28, 28) > 0.5), jnp.float32
        ),
        "class_embeddings": jnp.asarray(
            rng.randn(49, 768), jnp.float32
        ),
        "lvis_class_embeddings": jnp.asarray(
            rng.randn(1203, 768), jnp.float32
        ),
    }
    small = {
        k: v[:1]
        for k, v in batch.items()
        if hasattr(v, "shape") and v.shape and v.shape[0] == b
    }
    params = jax.jit(
        lambda r, im, sz, bt, ce, le: model.init(
            r, im, sz, bt, ce, le, train=True
        )
    )(
        {
            "params": jax.random.PRNGKey(0),
            "sampler": jax.random.PRNGKey(1),
            "uncertainty": jax.random.PRNGKey(2),
        },
        small["images"],
        small["image_sizes"],
        small,
        batch["class_embeddings"],
        batch["lvis_class_embeddings"],
    )
    tx, _ = make_optimizer(
        cfg,
        params["params"],
        frozen_prefixes_from_cfg(cfg, "STGeneralizedRCNN"),
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(7))
    step = jax.jit(
        build_train_step(model, tx, "STGeneralizedRCNN"),
        donate_argnums=(0,),
    )
    state, m = step(state, batch)
    jax.block_until_ready(m["total_loss"])
    state, m = step(state, batch)
    jax.block_until_ready(m["total_loss"])
    trace_dir = os.environ.get("ST_PROFILE_DIR")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                state, m = step(state, batch)
            float(m["total_loss"])
        from profile_step import summarize_trace

        summarize_trace(trace_dir, 3)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch)
    jax.block_until_ready(m["total_loss"])
    dt = (time.perf_counter() - t0) / n
    out = {
        "metric": "st_distill_train_imgs_per_sec_per_chip",
        "value": round(b / dt, 3),
        "unit": "imgs/sec/chip",
        "pseudo_masks_per_sec": round(b * nw / dt, 1),
        "step_ms": round(dt * 1e3, 1),
    }
    # FLOPs -> MFU (VERDICT r2 item 4: the paper's workload needs a
    # roofline number too); XLA cost analysis of the compiled step
    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.profiler import (
        compiled_step_flops,
        mfu_metrics,
    )

    try:
        flops = compiled_step_flops(step, state, batch)
        if flops > 0:
            out["flops_per_step"] = flops
            out.update(mfu_metrics(flops, dt))
    except Exception as e:
        out["mfu_note"] = f"cost_analysis unavailable: {type(e).__name__}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
