#!/usr/bin/env python
"""Device-level profile of the benchmark train step.

Captures a jax.profiler trace of a few warmed train steps on the
attached TPU and prints the top device ops by total duration from the
Chrome-format trace (no tensorboard needed).  This is the tool that
identifies which fusions to attack next (the reference's equivalent
workflow is nvprof/nsight over the CUDA kernels).

Usage: python tools/profile_step.py [batch_size] [trace_dir]
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def build_step(batch_size):
    """Same model/step construction as bench.py (kept in sync)."""
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
        "images": jnp.asarray(rng.rand(batch_size, h, w, 3), jnp.float32),
        "image_sizes": jnp.tile(
            jnp.array([[800, 1333]], jnp.int32), (batch_size, 1)
        ),
        "class_embeddings": jnp.asarray(rng.randn(49, 768), jnp.float32),
        "gt_boxes": jnp.asarray(
            np.concatenate(
                [
                    rng.uniform(0, 600, (batch_size, 20, 2)),
                    rng.uniform(650, 1300, (batch_size, 20, 2)),
                ],
                axis=-1,
            )[..., [0, 1, 2, 3]],
            jnp.float32,
        ),
        "gt_labels": jnp.asarray(
            rng.randint(1, 49, (batch_size, 20)), jnp.int32
        ),
        "gt_valid": jnp.ones((batch_size, 20), bool),
        "gt_masks": jnp.asarray(
            (rng.rand(batch_size, 20, 28, 28) > 0.5), jnp.float32
        ),
    }
    init_fn = jax.jit(
        lambda rngs, im, sz, ce, tg: model.init(
            rngs, im, sz, ce, tg, train=True
        )
    )
    params = init_fn(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        batch["images"][:1],
        batch["image_sizes"][:1],
        batch["class_embeddings"],
        {k: batch[k][:1]
         for k in ("gt_boxes", "gt_labels", "gt_valid", "gt_masks")},
    )
    tx, _ = make_optimizer(
        cfg, params["params"], frozen_prefixes_from_cfg(cfg)
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(7))
    step = jax.jit(
        build_train_step(model, tx, "GeneralizedRCNN"), donate_argnums=(0,)
    )
    return step, state, batch


def summarize_trace(trace_dir, n_steps, top=40):
    """Parses the Chrome trace; prints device ops by total duration."""
    paths = sorted(
        glob.glob(
            os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
        )
    )
    if not paths:
        print("no trace found under", trace_dir)
        return
    d = json.load(gzip.open(paths[-1]))
    events = d.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, n in pids.items() if n and "TPU" in n}
    tot = collections.Counter()
    cnt = collections.Counter()
    device_total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            name = e.get("name", "")
            if name.startswith("jit_"):  # whole-program envelope
                continue
            tot[name] += e.get("dur", 0)
            cnt[name] += 1
            device_total += e.get("dur", 0)
    print(f"device busy total: {device_total / 1e3 / n_steps:.2f} ms/step")
    print(f"{'ms/step':>9} {'%':>5} {'count':>6}  op")
    for name, us in tot.most_common(top):
        print(
            f"{us / 1e3 / n_steps:9.3f} {100 * us / device_total:5.1f} "
            f"{cnt[name] // n_steps:6d}  {name[:100]}"
        )


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/step_trace"
    n_steps = 3

    step, state, batch = build_step(batch_size)
    # warm (compile via persistent cache + one real step)
    state, metrics = step(state, batch)
    float(metrics["total_loss"])  # sync through the tunnel
    state, metrics = step(state, batch)
    float(metrics["total_loss"])

    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            state, metrics = step(state, batch)
        float(metrics["total_loss"])

    summarize_trace(trace_dir, n_steps)


if __name__ == "__main__":
    main()
