#!/usr/bin/env python
"""Exports the eval forward as a self-contained serving artifact.

`jax.export` serializes the jitted eval program (StableHLO) with the
checkpoint weights baked in as constants, so a serving process needs no
model code — just `jax.export.deserialize(blob).call(images, sizes)`.
The reference has no serving story (torch .pth + full code tree); this
is the TPU-native equivalent of a frozen inference graph.

Usage:
  python tools/export_serving.py --config-file cfg.yaml \
      [--ckpt model.pth|orbax_dir] --out model.stablehlo [KEY VALUE ...]

The artifact is portable across machines with the same accelerator
platform (and newer jax releases, per jax.export compatibility
guarantees).  A manifest JSON with shapes/vocab is written next to it.
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def build_eval_fn(cfg, class_emb, params):
    import jax
    import jax.numpy as jnp

    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
        build_detection_model,
        statics_from_cfg,
    )

    model = build_detection_model(cfg)
    class_emb = jnp.asarray(class_emb, jnp.float32)

    meta = cfg.MODEL.META_ARCHITECTURE

    def fn(images, image_sizes):
        if meta == "STGeneralizedRCNN":
            out = model.apply(
                params,
                images,
                image_sizes,
                class_embeddings=class_emb,
                train=False,
            )
        else:
            out = model.apply(
                params, images, image_sizes, class_emb, train=False
            )
        res = {
            "boxes": out.detections.boxes,
            "scores": out.detections.scores,
            "labels": out.detections.labels,
            "valid": out.detections.valid,
        }
        if out.mask_probs is not None:
            res["mask_probs"] = out.mask_probs
        return res

    return fn


def export_model(cfg, params, class_emb, batch, height, width, out_path):
    """Serializes the jitted eval program; returns the manifest dict."""
    import jax
    import jax.numpy as jnp

    fn = build_eval_fn(cfg, class_emb, params)
    images = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32)
    sizes = jax.ShapeDtypeStruct((batch, 2), jnp.int32)
    exported = jax.export.export(jax.jit(fn))(images, sizes)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    manifest = {
        "input_shape": [batch, height, width, 3],
        "platforms": list(exported.platforms),
        "num_classes": int(np.asarray(class_emb).shape[0]),
        "meta_architecture": cfg.MODEL.META_ARCHITECTURE,
        "bytes": len(blob),
    }
    with open(out_path + ".json", "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def load_and_run(path, images, image_sizes):
    """Serving side: no model code needed."""
    import jax

    with open(path, "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    return exported.call(images, image_sizes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--out", default="model.stablehlo")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.build import (
        build_dataset,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.transforms import (
        build_transforms,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
        build_detection_model,
    )

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    # build_dataset(is_train=False) returns a list of datasets
    dataset = build_dataset(
        cfg, cfg.DATASETS.TEST[:1], build_transforms(cfg, False), False
    )[0]
    class_emb = np.asarray(dataset.class_emb_mtx, np.float32)

    model = build_detection_model(cfg)
    images = jnp.zeros((1, args.height, args.width, 3), jnp.float32)
    sizes = jnp.array([[args.height, args.width]], jnp.int32)
    # class_embeddings by keyword: STGeneralizedRCNN's third positional
    # is `batch`, not the vocabulary (same as build_eval_fn above)
    params = jax.jit(
        lambda r, im, sz, ce: model.init(
            r, im, sz, class_embeddings=ce, train=False
        )
    )(
        {"params": jax.random.PRNGKey(0)},
        images,
        sizes,
        jnp.asarray(class_emb),
    )
    if args.ckpt:
        from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
            import_torch_state_dict,
            load_checkpoint,
            load_torch_checkpoint,
        )

        if args.ckpt.endswith((".pth", ".pkl")):
            sd = load_torch_checkpoint(args.ckpt)
            new_params, report = import_torch_state_dict(
                params["params"], sd
            )
            params = {"params": new_params}
            print(f"imported {report['matched']} tensors from {args.ckpt}")
        else:
            # training checkpoints store {'state': {params, opt_state,
            # ...}, 'iteration': ...}; restore raw and take the
            # apply-ready params dict (same pattern as tools/test_net.py)
            params = load_checkpoint(args.ckpt)["state"]["params"]
            print(f"loaded orbax checkpoint {args.ckpt}")

    manifest = export_model(
        cfg, params, class_emb, args.batch, args.height, args.width,
        args.out,
    )
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
