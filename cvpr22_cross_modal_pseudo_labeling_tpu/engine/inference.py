"""Inference driver: dataset -> jitted eval forward -> COCO metrics.

Re-design of reference engine/inference.py:25-175: per-dataset class
embeddings are an argument to the compiled forward (replacing
set_class_embeddings mutation, inference.py:123-129), per-batch device
outputs stream to host asynchronously, predictions accumulate as
COCO-format dicts, multi-host gathers use process_allgather instead of
the pickle all_gather (utils/comm.py:48-88), then the evaluator runs.
"""

import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.evaluation import evaluate
from ..data.evaluation.prepare import detections_to_coco_results
from ..utils.logger import get_logger
from ..utils.metric_logger import Timer


def compute_on_dataset(
    model,
    params,
    loader,
    dataset,
    class_embeddings: Optional[np.ndarray],
    mask_on: bool = True,
    apply_kwargs: Optional[dict] = None,
    mesh=None,
) -> List[dict]:
    """Runs eval forward over the loader; returns COCO-format results.

    ``mesh`` shards the eval batch over the 'data' axis of a device
    mesh (single-process multi-chip eval; the multi-HOST split is the
    per-process dataset shard + process_allgather, matching the
    reference's per-rank inference, engine/inference.py:25-46)."""
    logger = get_logger("inference")
    apply_kwargs = apply_kwargs or {}
    class_emb = (
        jnp.asarray(class_embeddings)
        if class_embeddings is not None
        else None
    )

    def _forward(p, images, image_sizes):
        # class_embeddings by keyword: STGeneralizedRCNN's third
        # positional is `batch`, not the vocabulary (ADVICE r1).
        return model.apply(
            p,
            images,
            image_sizes,
            class_embeddings=class_emb,
            train=False,
            **apply_kwargs,
        )

    fallback = jax.jit(_forward)
    if mesh is not None:
        # eval feeds host-local arrays: a mesh spanning other
        # processes cannot be used here (the multi-HOST split is the
        # per-process dataset shard + gather); callers normally pass a
        # process-local mesh, but guard against a global one.
        procs = {d.process_index for d in mesh.devices.flat}
        if procs != {jax.process_index()}:
            logger.warning(
                "eval mesh spans processes %s; falling back to the "
                "single-device program (pass a process-local mesh)",
                sorted(procs),
            )
            mesh = None
        elif "data" not in mesh.shape:
            mesh = None
    if mesh is not None:
        from ..parallel.mesh import data_sharded, replicated

        sharded = jax.jit(
            _forward,
            in_shardings=(
                replicated(mesh), data_sharded(mesh), data_sharded(mesh)
            ),
        )
        # the batch is split over the 'data' axis only (params and any
        # 'model' axis are replicated), so divisibility is gated on the
        # data-axis size, not the total device count
        n_data = int(mesh.shape["data"])

        def forward(p, images, image_sizes):
            # ragged final batch falls back to the unsharded program
            if images.shape[0] % n_data == 0:
                return sharded(p, images, image_sizes)
            return fallback(p, images, image_sizes)

    else:
        forward = fallback

    # host COCO conversion (mask paste + RLE encode) runs in a thread
    # pool so the device computes batch N+1 while batch N converts —
    # conversion is ~ms-per-detection host work that would otherwise
    # serialize with the forward (the reference converts after the
    # whole pass instead, holding every mask tensor in memory)
    import concurrent.futures as cf

    def convert_batch(dets, mask_probs, indices, image_sizes, kps=None):
        out: List[dict] = []
        for bi, ds_index in enumerate(indices):
            if bi >= dets.boxes.shape[0]:
                break
            info = dataset.get_img_info(ds_index)
            out.extend(
                detections_to_coco_results(
                    dets.boxes[bi],
                    dets.scores[bi],
                    dets.labels[bi],
                    dets.valid[bi],
                    mask_probs[bi] if mask_probs is not None else None,
                    image_id=dataset.id_to_img_map[ds_index]
                    if hasattr(dataset, "id_to_img_map")
                    else info.get("id", ds_index),
                    input_hw=image_sizes[bi],
                    original_hw=(info["height"], info["width"]),
                    contiguous_to_json=getattr(
                        dataset, "contiguous_category_id_to_json_id", {}
                    ),
                    keypoints=kps[bi] if kps is not None else None,
                )
            )
        return out

    futures = []
    results: List[dict] = []
    timer = Timer()
    batch_times: List[Tuple[float, int]] = []  # (seconds, images)
    wall_start = time.perf_counter()
    n_images = 0
    workers = min(8, os.cpu_count() or 1)
    # backpressure: each pending future retains its batch's device_get'd
    # mask_probs; drain oldest-first beyond 2x the pool so host
    # conversion slower than the device forward cannot accumulate every
    # mask tensor in memory (ADVICE r2 low).  Order is preserved:
    # futures are drained and extended FIFO.
    max_inflight = 2 * workers
    with cf.ThreadPoolExecutor(max_workers=workers) as pool:
        for batch, indices in loader:
            timer.tic()
            out = forward(
                params,
                jnp.asarray(batch["images"]),
                jnp.asarray(batch["image_sizes"]),
            )
            dets = jax.device_get(out.detections)
            mask_probs = (
                jax.device_get(out.mask_probs)
                if mask_on and out.mask_probs is not None
                else None
            )
            kps = (
                jax.device_get(out.keypoints)
                if getattr(out, "keypoints", None) is not None
                else None
            )
            timer.toc()
            batch_times.append(
                (timer.diff, int(batch["images"].shape[0]))
            )
            futures.append(
                pool.submit(
                    convert_batch,
                    dets,
                    mask_probs,
                    list(indices),
                    np.asarray(batch["image_sizes"]),
                    kps,
                )
            )
            while len(futures) > max_inflight:
                results.extend(futures.pop(0).result())
            n_images += sum(
                1 for bi in range(len(indices)) if bi < dets.boxes.shape[0]
            )
        for f in futures:
            results.extend(f.result())
    if n_images:
        # split mirrors reference engine/inference.py:136-156 (total vs
        # model time): `device` is forward+device_get; the e2e line adds
        # host decode/collate and paste/RLE conversion overlap.  The
        # `steady` figures drop the first batch (it carries the XLA
        # compile of the eval program on a cold cache).
        wall = time.perf_counter() - wall_start
        steady_s = sum(t for t, _ in batch_times[1:])
        steady_n = sum(n for _, n in batch_times[1:])
        compile_s = batch_times[0][0] if batch_times else 0.0
        steady_wall = max(wall - compile_s, 1e-9)
        logger.info(
            "inference: %d images, %.4f s/img device "
            "(steady %.4f excl. first-batch %.1f s), %.4f s/img e2e "
            "(%.2f imgs/s e2e; steady %.2f imgs/s; device busy %.0f%%)",
            n_images,
            timer.total_time / n_images,
            steady_s / max(steady_n, 1),
            compile_s,
            wall / n_images,
            n_images / wall,
            max(n_images - (batch_times[0][1] if batch_times else 0), 0)
            / steady_wall,
            100.0 * timer.total_time / wall,
        )
    return results


def compute_on_dataset_bbox_aug(
    model,
    params,
    dataset,
    class_embeddings: Optional[np.ndarray],
    bbox_aug: dict,
) -> List[dict]:
    """Multi-scale + flip test-time augmentation (reference
    engine/bbox_aug.py:11-131 via engine/inference.py usage).

    ``bbox_aug`` keys: scales, max_size, h_flip, scale_h_flip,
    base_scale, base_max_size, pixel_mean, pixel_std, to_bgr255,
    buckets, size_divisible, nms_thresh, detections_per_img.
    Each distinct (bucket, ) shape compiles once; variants of an image
    reuse the cached executable.  Box-only (the reference's TTA path
    does not aggregate masks either).
    """
    from ..data.collate import select_bucket
    from ..data.transforms import Normalize, resize_image
    from .bbox_aug import im_detect_bbox_aug

    class_emb = (
        jnp.asarray(class_embeddings)
        if class_embeddings is not None
        else None
    )
    normalize = Normalize(
        bbox_aug["pixel_mean"],
        bbox_aug["pixel_std"],
        bbox_aug.get("to_bgr255", True),
    )

    @jax.jit
    def forward(p, images, image_sizes):
        return model.apply(
            p, images, image_sizes, class_embeddings=class_emb, train=False
        )

    def run_variant(image, hw, flipped):
        h, w = image.shape[:2]
        nh, nw = hw
        img = image
        if (nh, nw) != (h, w):
            # shared dtype-aware resize (raw_sample images are uint8;
            # a hand-rolled `img * 255` here once overflowed them)
            img = resize_image(img, nh, nw)
        if flipped:
            img = img[:, ::-1]
        img = normalize({"image": img}, None)["image"]
        hb, wb = select_bucket(
            nh, nw, bbox_aug["buckets"],
            bbox_aug.get("size_divisible", 32),
        )
        padded = np.zeros((1, hb, wb, 3), np.float32)
        padded[0, :nh, :nw] = img
        out = forward(
            params,
            jnp.asarray(padded),
            jnp.asarray([[nh, nw]], jnp.int32),
        )
        dets = jax.device_get(out.detections)
        keep = dets.valid[0]
        boxes = dets.boxes[0][keep]
        # input frame -> original frame (flip stays; the driver
        # unflips in the original frame)
        boxes = boxes * np.array(
            [w / nw, h / nh, w / nw, h / nh], np.float32
        )
        return boxes, dets.scores[0][keep], dets.labels[0][keep]
    results: List[dict] = []
    contig_to_json = getattr(
        dataset, "contiguous_category_id_to_json_id", {}
    )
    for index in range(len(dataset)):
        raw = dataset.raw_sample(index)
        boxes, scores, labels = im_detect_bbox_aug(
            run_variant,
            raw["image"],
            scales=bbox_aug["scales"],
            max_size=bbox_aug["max_size"],
            h_flip=bbox_aug["h_flip"],
            scale_h_flip=bbox_aug["scale_h_flip"],
            base_scale=bbox_aug["base_scale"],
            nms_thresh=bbox_aug.get("nms_thresh", 0.5),
            detections_per_img=bbox_aug.get("detections_per_img", 100),
        )
        img_id = raw.get(
            "image_id",
            dataset.id_to_img_map[index]
            if hasattr(dataset, "id_to_img_map")
            else index,
        )
        for b, s, lbl in zip(boxes, scores, labels):
            x1, y1, x2, y2 = [float(v) for v in b]
            results.append(
                {
                    "image_id": int(img_id),
                    "category_id": int(
                        contig_to_json.get(int(lbl), int(lbl))
                    ),
                    "bbox": [x1, y1, x2 - x1 + 1.0, y2 - y1 + 1.0],
                    "score": float(s),
                }
            )
    return results


def evaluate_proposals(
    model, params, loader, dataset, limit: int = 1000,
    output_file: Optional[str] = None,
) -> Dict[str, float]:
    """RPN_ONLY evaluation: box-proposal AR over the dataset
    (the reference's evaluate_box_proposals path).  Multi-process runs
    gather the per-host proposal shards first, exactly like the
    detection path — each rank's loader sees a disjoint image subset,
    so a shard-local AR is not the whole-dataset number."""
    import jax.numpy as jnp

    @jax.jit
    def forward(p, images, image_sizes):
        return model.apply(
            p, images, image_sizes, class_embeddings=None, train=False
        )

    proposals_by_image = {}
    for batch, indices in loader:
        out = forward(
            params,
            jnp.asarray(batch["images"]),
            jnp.asarray(batch["image_sizes"]),
        )
        dets = jax.device_get(out.detections)
        for bi, ds_index in enumerate(indices):
            info = dataset.get_img_info(ds_index)
            ih, iw = batch["image_sizes"][bi]
            sx, sy = info["width"] / iw, info["height"] / ih
            keep = dets.valid[bi]
            boxes = dets.boxes[bi][keep] * np.array(
                [sx, sy, sx, sy], np.float32
            )
            scores = dets.scores[bi][keep]
            img_id = (
                dataset.id_to_img_map[ds_index]
                if hasattr(dataset, "id_to_img_map")
                else info.get("id", ds_index)
            )
            proposals_by_image[img_id] = np.concatenate(
                [boxes, scores[:, None]], axis=1
            ).astype(np.float64)
    if jax.process_count() > 1:
        from ..parallel.mesh import gather_objects

        gathered = gather_objects(proposals_by_image)
        proposals_by_image = {
            k: v for part in gathered for k, v in part.items()
        }
    if output_file and jax.process_index() == 0:
        import json

        with open(output_file, "w") as f:
            json.dump(
                {int(k): v.tolist() for k, v in proposals_by_image.items()},
                f,
            )
    from ..data.evaluation.box_proposals import evaluate_box_proposals

    out = {}
    for area in ("all", "small", "medium", "large"):
        res = evaluate_box_proposals(
            proposals_by_image, dataset.coco, area=area, limit=limit
        )
        out[f"box_proposal/AR_{area}@{limit}"] = res["ar"]
    return out


def inference(
    model,
    params,
    loader,
    dataset,
    iou_types=("bbox",),
    expected_results=(),
    expected_results_sigma_tol: float = 4.0,
    output_file: Optional[str] = None,
    bbox_aug: Optional[dict] = None,
    mesh=None,
) -> Dict[str, float]:
    """Full eval pass (engine/inference.py:104-175).  ``bbox_aug``
    (TEST.BBOX_AUG.ENABLED) switches to the multi-scale + flip TTA
    path, which is bbox-only."""
    statics = getattr(model, "statics", None)
    if statics is not None and getattr(statics, "rpn_only", False):
        return evaluate_proposals(
            model, params, loader, dataset, output_file=output_file
        )
    class_emb = getattr(dataset, "class_emb_mtx", None)
    start = time.time()
    if bbox_aug:
        results = compute_on_dataset_bbox_aug(
            model, params, dataset, class_emb, bbox_aug
        )
        iou_types = tuple(t for t in iou_types if t == "bbox")
    else:
        results = compute_on_dataset(
            model, params, loader, dataset, class_emb, mesh=mesh
        )
    if jax.process_count() > 1:
        # pickle-to-padded-uint8 gather of the per-host COCO dicts
        # (the reference's utils/comm.py:48-88 all_gather); a failure
        # here must surface — silently reporting rank-0-only metrics
        # corrupts the evaluation
        from ..parallel.mesh import gather_objects

        gathered = gather_objects(results)
        results = [r for part in gathered for r in part]
    if output_file and jax.process_index() == 0:
        import json

        with open(output_file, "w") as f:
            json.dump(results, f)
    metrics = evaluate(
        dataset,
        results,
        iou_types=iou_types,
        expected_results=expected_results,
        expected_results_sigma_tol=expected_results_sigma_tol,
    )
    metrics["total_eval_seconds"] = time.time() - start
    return metrics
