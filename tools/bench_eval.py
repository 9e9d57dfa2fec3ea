#!/usr/bin/env python
"""Inference throughput: eval forward (RPN + box head + per-class NMS +
mask head) at test shapes on the attached chip."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
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
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 66  # generalized zero-shot vocab
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"

    model = GeneralizedRCNN(statics_from_cfg(cfg))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    sizes = jnp.tile(jnp.array([[800, 1333]], jnp.int32), (b, 1))
    emb = jnp.asarray(rng.randn(66, 768), jnp.float32)
    params = jax.jit(
        lambda r, im, sz, ce: model.init(r, im, sz, ce, train=False)
    )({"params": jax.random.PRNGKey(0)}, images[:1], sizes[:1], emb)

    fwd = jax.jit(
        lambda p, im, sz, ce: model.apply(p, im, sz, ce, train=False)
    )
    out = fwd(params, images, sizes, emb)
    jax.block_until_ready(out.detections.boxes)
    float(jnp.sum(out.detections.scores))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, images, sizes, emb)
    float(jnp.sum(out.detections.scores))
    dt = (time.perf_counter() - t0) / n
    result = {
        "metric": "maskrcnn_r50c4_eval_imgs_per_sec_per_chip",
        "value": round(b / dt, 3),
        "unit": "imgs/sec/chip",
        "batch": b,
    }
    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.profiler import (
        compiled_step_flops,
        mfu_metrics,
    )

    try:
        flops = compiled_step_flops(fwd, params, images, sizes, emb)
        if flops > 0:
            result.update(mfu_metrics(flops, dt))
    except Exception as e:
        result["mfu_note"] = f"cost_analysis unavailable: {type(e).__name__}"

    # serving latency: batch-1 single-image forward, the number an online
    # deployment cares about (p50 of a steady-state loop)
    im1, sz1 = images[:1], sizes[:1]
    out = fwd(params, im1, sz1, emb)
    float(jnp.sum(out.detections.scores))
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        out = fwd(params, im1, sz1, emb)
        jax.block_until_ready(out.detections.boxes)
        lats.append(time.perf_counter() - t0)
    result["bs1_latency_ms_p50"] = round(1e3 * sorted(lats)[len(lats) // 2], 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
