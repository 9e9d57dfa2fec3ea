"""Inference driver: dataset -> jitted eval forward -> COCO metrics.

Re-design of reference engine/inference.py:25-175: per-dataset class
embeddings are an argument to the compiled forward (replacing
set_class_embeddings mutation, inference.py:123-129), per-batch device
outputs stream to host asynchronously, predictions accumulate as
COCO-format dicts, multi-host gathers use process_allgather instead of
the pickle all_gather (utils/comm.py:48-88), then the evaluator runs.
"""

import time
from typing import Dict, List, Optional

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
) -> List[dict]:
    """Runs eval forward over the loader; returns COCO-format results."""
    logger = get_logger("inference")
    apply_kwargs = apply_kwargs or {}
    class_emb = (
        jnp.asarray(class_embeddings)
        if class_embeddings is not None
        else None
    )

    @jax.jit
    def forward(p, images, image_sizes):
        return model.apply(
            p, images, image_sizes, class_emb, train=False, **apply_kwargs
        )

    results: List[dict] = []
    timer = Timer()
    n_images = 0
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
        timer.toc()
        for bi, ds_index in enumerate(indices):
            if bi >= dets.boxes.shape[0]:
                break
            info = dataset.get_img_info(ds_index)
            results.extend(
                detections_to_coco_results(
                    dets.boxes[bi],
                    dets.scores[bi],
                    dets.labels[bi],
                    dets.valid[bi],
                    mask_probs[bi] if mask_probs is not None else None,
                    image_id=dataset.id_to_img_map[ds_index]
                    if hasattr(dataset, "id_to_img_map")
                    else info.get("id", ds_index),
                    input_hw=batch["image_sizes"][bi],
                    original_hw=(info["height"], info["width"]),
                    contiguous_to_json=getattr(
                        dataset, "contiguous_category_id_to_json_id", {}
                    ),
                )
            )
            n_images += 1
    if n_images:
        logger.info(
            "inference: %d images, %.4f s/img (device+host)",
            n_images,
            timer.total_time / n_images,
        )
    return results


def evaluate_proposals(
    model, params, loader, dataset, limit: int = 1000
) -> Dict[str, float]:
    """RPN_ONLY evaluation: box-proposal AR over the dataset
    (the reference's evaluate_box_proposals path)."""
    import jax.numpy as jnp

    @jax.jit
    def forward(p, images, image_sizes):
        return model.apply(p, images, image_sizes, None, train=False)

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
) -> Dict[str, float]:
    """Full eval pass (engine/inference.py:104-175)."""
    statics = getattr(model, "statics", None)
    if statics is not None and getattr(statics, "rpn_only", False):
        return evaluate_proposals(model, params, loader, dataset)
    class_emb = getattr(dataset, "class_emb_mtx", None)
    start = time.time()
    results = compute_on_dataset(
        model, params, loader, dataset, class_emb
    )
    try:
        from ..parallel.mesh import process_allgather

        if jax.process_count() > 1:
            gathered = process_allgather(results)
            results = [r for part in gathered for r in part]
    except Exception:
        pass
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
