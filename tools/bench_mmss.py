#!/usr/bin/env python
"""Benchmark the MMSS image-caption grounding pretraining step
(BASELINE.json config #2: coco_cap_det/mmss.yaml, global batch 64 over
8 chips) on the attached TPU chip.

Two measurements:

* ``per_chip``   — the full train step at the per-chip batch
  (64 global / 8 chips = 8) at production image shape 800x1344,
  R-50-C5 + BERT + GroundingHead + TransformerHead (MLM on, and the
  B^2 pairwise matching loss of the shipped mmss.yaml — a per-chip
  local-batch loss, 64 pairs at b=8, matching the reference's
  per-GPU computation).
* ``global_b64`` — the full step at B=64 with 320x320 images: the
  10x10 grid equals the SPATIAL_DROPOUT=100 region count, so the
  grounding/transformer heads run at their exact global-batch shapes
  (the BxBxWxR buffers VERDICT r1 flagged) with a lighter backbone.

Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build(cfg_overrides=None, mmm=False):
    from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    # TPU.S2D_STEM experiment (VERDICT r3 item 9): BENCH_MMSS_S2D=1
    if os.environ.get("BENCH_MMSS_S2D") == "1":
        cfg.TPU.S2D_STEM = True
    cfg.MODEL.META_ARCHITECTURE = "MMSS-GCNN"
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-C5"
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 0
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 2048
    cfg.MODEL.MMSS_HEAD.TYPES = ("GroundingHead", "TransformerHead")
    cfg.MODEL.MMSS_HEAD.DEFAULT_HEAD = "GroundingHead"
    cfg.MODEL.MMSS_HEAD.TIE_VL_PROJECTION_WEIGHTS = True
    cfg.MODEL.MMSS_HEAD.SPATIAL_DROPOUT = 100
    cfg.MODEL.MMSS_HEAD.GROUNDING.LOCAL_METRIC = "dot"
    cfg.MODEL.MMSS_HEAD.GROUNDING.GLOBAL_METRIC = "aligned_local"
    cfg.MODEL.MMSS_HEAD.GROUNDING.ALIGNMENT = "softmax"
    cfg.MODEL.MMSS_HEAD.GROUNDING.ALIGNMENT_TEMPERATURE = 10.0
    cfg.MODEL.MMSS_HEAD.GROUNDING.LOSS = "cross_entropy"
    cfg.MODEL.MMSS_HEAD.TRANSFORMER.MASKED_LANGUAGE_MODELING = True
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.CLIP_GRAD_NORM_AT = 5.0
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if mmm:
        # the shipped mmss.yaml trains the B^2 pairwise matching loss;
        # it is a per-chip-local-batch loss in a data-parallel run, so
        # it belongs to the per_chip case (the reference computes B=8
        # local pairs per GPU, never B=64 global pairs)
        cfg.MODEL.MMSS_HEAD.TRANSFORMER.MMM_LOSS = "cross_entropy"
    return cfg


def run_case(name, b, h, w, n_steps=10, mmm=False):
    import jax
    import jax.numpy as jnp

    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.optimizer import (
        frozen_prefixes_from_cfg,
        make_optimizer,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
        build_train_step,
        create_train_state,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.mmss_gcnn import (
        MMSSGridModel,
        mmss_statics_from_cfg,
    )

    cfg = build(mmm=mmm)
    model = MMSSGridModel(mmss_statics_from_cfg(cfg))
    rng = np.random.RandomState(0)
    t = 20  # caption wordpieces (COCO captions ~ 12-16 + specials)
    special = np.zeros((b, t), np.int32)
    special[:, 0] = 1
    special[:, -1] = 1
    batch = {
        "images": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        "image_sizes": jnp.tile(
            jnp.array([[h - 24, w - 11]], jnp.int32), (b, 1)
        ),
        "input_ids": jnp.asarray(
            rng.randint(1000, 30000, (b, t)), jnp.int32
        ),
        "attention_mask": jnp.ones((b, t), jnp.int32),
        "special_tokens_mask": jnp.asarray(special),
    }
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "mlm": jax.random.PRNGKey(2),
        "alignment": jax.random.PRNGKey(3),
        "sampler": jax.random.PRNGKey(4),
    }
    captions_small = {
        k: batch[k][:1]
        for k in ("input_ids", "attention_mask", "special_tokens_mask")
    }
    params = jax.jit(
        lambda r, im, sz, c: model.init(r, im, sz, c, train=True)
    )(rngs, batch["images"][:1], batch["image_sizes"][:1], captions_small)
    tx, _ = make_optimizer(
        cfg, params["params"], frozen_prefixes_from_cfg(cfg, "MMSS-GCNN")
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(7))
    step = jax.jit(
        build_train_step(model, tx, "MMSS-GCNN"), donate_argnums=(0,)
    )

    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total_loss"])
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total_loss"])

    trace_dir = os.environ.get("MMSS_PROFILE_DIR")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                state, metrics = step(state, batch)
            float(metrics["total_loss"])
        from profile_step import summarize_trace

        summarize_trace(trace_dir, 3)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total_loss"])
    dt = time.perf_counter() - t0
    imgs_per_sec = b * n_steps / dt
    out = {
        "metric": f"mmss_pretrain_{name}_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/sec/chip",
        "batch": b,
        "image_hw": [h, w],
        "total_loss": round(float(metrics["total_loss"]), 4),
    }
    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.profiler import (
        compiled_step_flops,
        mfu_metrics,
    )

    try:
        flops = compiled_step_flops(step, state, batch)
        if flops > 0:
            out.update(mfu_metrics(flops, dt / n_steps))
    except Exception:
        pass
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("per_chip", "both"):
        run_case("per_chip_bs8", 8, 800, 1344,
                 mmm=os.environ.get("BENCH_MMSS_NO_MMM") != "1")
    if which in ("global_b64", "both"):
        run_case("global_b64_heads", 64, 320, 320)


if __name__ == "__main__":
    main()
