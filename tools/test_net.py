#!/usr/bin/env python
"""Evaluation CLI (mirrors reference tools/test_net.py:27-114):
``--config-file X.yaml [--ckpt path] KEY VALUE ...``."""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    p = argparse.ArgumentParser(description="TPU open-vocab detection eval")
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument(
        "--ckpt", default=None,
        help="checkpoint to evaluate (default: OUTPUT_DIR/last_checkpoint)",
    )
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from cvpr22_cross_modal_pseudo_labeling_tpu.data import make_data_loader
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.inference import (
        inference,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
        build_detection_model,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.logger import (
        setup_logger,
    )

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    logger = setup_logger("cmpl_tpu", cfg.OUTPUT_DIR, jax.process_index())

    if not cfg.DATASETS.TEST:
        # same behavior as the reference's zero-iteration loop over
        # cfg.DATASETS.TEST (test_net.py:95-113): nothing to evaluate
        logger.info("DATASETS.TEST is empty; nothing to evaluate")
        return

    model = build_detection_model(cfg)
    loaders, datasets = make_data_loader(
        cfg,
        is_train=False,
        is_distributed=jax.process_count() > 1,
        rank=jax.process_index(),
        num_replicas=jax.process_count(),
    )

    # initialize params with an eval-shaped example
    ds0 = datasets[0]
    sample = ds0[0]
    images = jnp.asarray(sample["image"][None])
    sizes = jnp.asarray(
        np.asarray([sample["image"].shape[:2]], np.int32)
    )
    class_emb = getattr(ds0, "class_emb_mtx", None)
    class_emb = (
        jnp.asarray(class_emb) if class_emb is not None else None
    )
    # class_embeddings by keyword — STGeneralizedRCNN's third positional
    # is the (eval-unused) train batch (ADVICE r1).
    params = jax.jit(
        lambda r, im, sz, ce: model.init(
            r, im, sz, class_embeddings=ce, train=False
        )
    )({"params": jax.random.PRNGKey(0)}, images, sizes, class_emb)

    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.model_zoo import (
        resolve_weight_path,
    )

    ckpt = args.ckpt or latest_checkpoint(cfg.OUTPUT_DIR)
    # resolve MODEL.WEIGHT (catalog:///URL chain) only when it will be
    # loaded — a trained-checkpoint eval must not fetch (or fail on) an
    # init-weight URL it never uses
    weight_path = (
        None if ckpt and os.path.isdir(ckpt)
        else resolve_weight_path(cfg.MODEL.WEIGHT)
    )
    if ckpt and os.path.isdir(ckpt):
        restored = load_checkpoint(ckpt)  # raw tree; only params needed
        params = restored["state"]["params"]
        logger.info("loaded orbax checkpoint %s", ckpt)
    elif weight_path:
        # MODEL.WEIGHT: orbax cross-stage / caffe2 .pkl / torch .pth —
        # one shared chain with train_net (engine/checkpoint.py::
        # import_external_weights)
        from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
            import_external_weights,
        )

        new_params, msg = import_external_weights(
            params["params"], weight_path, cfg
        )
        if msg:
            params = {"params": new_params}
            logger.info("%s", msg)

    iou_types = (
        ("bbox",)
        + (("segm",) if cfg.MODEL.MASK_ON else ())
        + (("keypoints",) if cfg.MODEL.KEYPOINT_ON else ())
    )
    bbox_aug = None
    if cfg.TEST.BBOX_AUG.ENABLED:
        bbox_aug = {
            "scales": cfg.TEST.BBOX_AUG.SCALES,
            "max_size": cfg.TEST.BBOX_AUG.MAX_SIZE,
            "h_flip": cfg.TEST.BBOX_AUG.H_FLIP,
            "scale_h_flip": cfg.TEST.BBOX_AUG.SCALE_H_FLIP,
            "base_scale": cfg.INPUT.MIN_SIZE_TEST,
            "pixel_mean": cfg.INPUT.PIXEL_MEAN,
            "pixel_std": cfg.INPUT.PIXEL_STD,
            "to_bgr255": cfg.INPUT.TO_BGR255,
            "buckets": cfg.TPU.IMAGE_BUCKETS,
            "size_divisible": cfg.DATALOADER.SIZE_DIVISIBILITY,
            "nms_thresh": cfg.MODEL.ROI_HEADS.NMS,
            "detections_per_img": cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG,
        }
    # eval feeds host-local batches: shard them over this process's
    # devices (the multi-host split is the dataset shard + gather)
    from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import (
        local_eval_mesh,
    )

    mesh = local_eval_mesh()
    for name, loader, dataset in zip(cfg.DATASETS.TEST, loaders, datasets):
        metrics = inference(
            model,
            params,
            loader,
            dataset,
            iou_types=iou_types,
            expected_results=cfg.TEST.EXPECTED_RESULTS,
            expected_results_sigma_tol=cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL,
            output_file=os.path.join(
                cfg.OUTPUT_DIR, f"predictions_{name}.json"
            ),
            bbox_aug=bbox_aug,
            mesh=mesh,
        )
        logger.info(
            "eval[%s]: %s",
            name,
            {
                k: round(v, 4)
                for k, v in metrics.items()
                if isinstance(v, float) and "AP50_class" not in k
            },
        )
        # machine-readable artifact next to predictions_{name}.json —
        # tools/mint_baseline.py diffs these against the reference eval
        with open(
            os.path.join(cfg.OUTPUT_DIR, f"metrics_{name}.json"), "w"
        ) as f:
            json.dump(
                {k: float(v) for k, v in metrics.items()
                 if isinstance(v, (int, float))},
                f, indent=1, sort_keys=True,
            )


if __name__ == "__main__":
    main()
