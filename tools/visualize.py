#!/usr/bin/env python
"""Batch visualization of predictions (the reference's
visualization_uncertainty / visualization_mask drivers,
engine/inference.py:212-443, as a CLI).

Consumes the COCO-format predictions JSON that tools/test_net.py
writes to OUTPUT_DIR/predictions_<dataset>.json and renders per-image panels: ground truth on the left
(green boxes), predictions on the right (palette boxes + RLE masks,
unseen-split class names flagged with '*' like the reference's
overlay_class_names, inference.py:461-508).

Usage:
  python tools/visualize.py --config-file cfg.yaml \
      --predictions preds.json --out viz/ [--limit 20]
      [--score-thresh 0.5] [KEY VALUE ...]
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def render_image(dataset, img_id, dets, score_thresh, unseen_json_ids):
    from PIL import Image

    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.rle import decode_rle
    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.visualization import (
        overlay_detections,
    )

    info = dataset.coco.imgs[img_id]
    path = os.path.join(dataset.root, info["file_name"])
    with Image.open(path) as im:
        image = np.asarray(im.convert("RGB"), np.uint8)

    # left: GT
    gts = dataset.coco.load_anns_for_image(img_id)
    gt_boxes = np.asarray(
        [
            [
                a["bbox"][0],
                a["bbox"][1],
                a["bbox"][0] + a["bbox"][2],
                a["bbox"][1] + a["bbox"][3],
            ]
            for a in gts
        ],
        np.float32,
    ).reshape(-1, 4)
    left = overlay_detections(image, gt_boxes)

    # right: predictions with names + masks
    dets = [d for d in dets if d["score"] >= score_thresh]
    boxes = np.asarray(
        [
            [
                d["bbox"][0],
                d["bbox"][1],
                d["bbox"][0] + d["bbox"][2],
                d["bbox"][1] + d["bbox"][3],
            ]
            for d in dets
        ],
        np.float32,
    ).reshape(-1, 4)
    scores = np.asarray([d["score"] for d in dets], np.float32)
    cat_names = []
    for d in dets:
        name = dataset.coco.cats.get(d["category_id"], {}).get(
            "name", str(d["category_id"])
        )
        if d["category_id"] in unseen_json_ids:
            name = "*" + name  # unseen-split flag (inference.py:489-494)
        cat_names.append(name)
    masks = None
    if dets and "segmentation" in dets[0]:
        masks = np.stack([decode_rle(d["segmentation"]) for d in dets])
    right = overlay_detections(
        image,
        boxes,
        scores=scores,
        labels=np.arange(len(dets)),
        class_names=cat_names,
        masks=masks,
        score_thresh=score_thresh,
    )
    return np.concatenate([left, right], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--predictions", required=True)
    ap.add_argument("--out", default="viz")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--score-thresh", type=float, default=0.5)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.build import (
        build_dataset,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.visualization import (
        save_visualization,
    )

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    datasets = build_dataset(cfg, cfg.DATASETS.TEST[:1], None, False)
    dataset = datasets[0] if isinstance(datasets, (list, tuple)) else datasets

    with open(args.predictions) as f:
        results = json.load(f)
    by_img = {}
    for d in results:
        by_img.setdefault(d["image_id"], []).append(d)

    unseen_json_ids = set()
    for split, ids in getattr(dataset, "class_splits", {}).items():
        if "unseen" in split or split == "target":
            unseen_json_ids.update(int(i) for i in ids)

    os.makedirs(args.out, exist_ok=True)
    n = 0
    for img_id in dataset.coco.get_img_ids():
        if n >= args.limit:
            break
        panel = render_image(
            dataset,
            img_id,
            by_img.get(img_id, []),
            args.score_thresh,
            unseen_json_ids,
        )
        save_visualization(
            os.path.join(args.out, f"{img_id:012d}.png"), panel
        )
        n += 1
    print(f"wrote {n} panels to {args.out}")


if __name__ == "__main__":
    main()
