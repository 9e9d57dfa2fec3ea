#!/usr/bin/env python
"""Host input-pipeline throughput: JPEG decode + resize/flip/normalize +
static-bucket collation, measured end-to-end through make_data_loader on
a synthetic COCO tree (no accelerator involved).

The train step consumes 30+ imgs/sec/chip; a v5e-8 host must therefore
sustain ~250 imgs/sec of decode+augment.  Prints one JSON line per
configuration (threaded prefetch loader and the grain pipeline).

Usage: python tools/bench_loader.py [n_images] [size]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def make_tree(root, n, hw):
    from PIL import Image

    rng = np.random.RandomState(0)
    os.makedirs(f"{root}/coco/train2017", exist_ok=True)
    os.makedirs(f"{root}/coco/zero-shot", exist_ok=True)
    images, anns = [], []
    aid = 1
    for i in range(n):
        fn = f"b_{i:06d}.jpg"
        arr = rng.randint(0, 255, (hw[0], hw[1], 3), np.uint8)
        Image.fromarray(arr).save(
            f"{root}/coco/train2017/{fn}", quality=90
        )
        images.append(
            {"id": i + 1, "file_name": fn, "width": hw[1], "height": hw[0]}
        )
        for _ in range(6):
            x, y = rng.randint(0, hw[1] - 80), rng.randint(0, hw[0] - 80)
            w, h = rng.randint(20, 70, 2)
            anns.append(
                {
                    "id": aid,
                    "image_id": i + 1,
                    "category_id": 1 + aid % 2,
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "area": float(w * h),
                    "iscrowd": 0,
                    "segmentation": [
                        [
                            float(x), float(y), float(x + w), float(y),
                            float(x + w), float(y + h), float(x), float(y + h),
                        ]
                    ],
                }
            )
            aid += 1
    cats = [
        {
            "id": c,
            "name": n_,
            "split": "seen",
            "embedding": {"BertEmb": np.zeros(768).tolist()},
        }
        for c, n_ in ((1, "cat"), (2, "dog"))
    ]
    with open(
        f"{root}/coco/zero-shot/instances_train2017_seen_2.json", "w"
    ) as f:
        json.dump(
            {"images": images, "annotations": anns, "categories": cats}, f
        )


def bench(cfg_mutator, name, root, n):
    from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.build import (
        make_data_loader,
    )

    cfg = get_default_cfg()
    cfg.DATASETS.TRAIN = ("coco_zeroshot_train",)
    cfg.DATASETS.DATASET_CLASS = "COCODataset"
    cfg.DATASETS.DATASET_ARGS = {
        "LOAD_EMBEDDINGS": True,
        "EMB_KEY": "BertEmb",
        "EMB_DIM": 768,
    }
    cfg.INPUT.MIN_SIZE_TRAIN = (800,)
    cfg.INPUT.MAX_SIZE_TRAIN = 1344
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.MAX_ITER = 10_000
    cfg_mutator(cfg)
    os.environ["CMPL_TPU_DATA_DIR"] = root

    loader, _ = make_data_loader(cfg, is_train=True)
    it = iter(loader)
    # warmup fills prefetch queues and touches every image once
    for _ in range(max(2, n // 8)):
        next(it)
    t0 = time.perf_counter()
    n_batches = 3 * max(2, n // 8)
    imgs = 0
    for _ in range(n_batches):
        batch, _ = next(it)
        imgs += batch["images"].shape[0]
    dt = time.perf_counter() - t0
    ncpu = os.cpu_count() or 1
    print(
        json.dumps(
            {
                "metric": f"loader_{name}_imgs_per_sec",
                "value": round(imgs / dt, 1),
                "unit": "imgs/sec (host)",
                "batch": 8,
                "host_cores": ncpu,
                "imgs_per_sec_per_core": round(imgs / dt / ncpu, 1),
            }
        ),
        flush=True,
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    root = tempfile.mkdtemp(prefix="bench_loader_")
    make_tree(root, n, (size, int(size * 1.5)))

    def threaded(cfg):
        cfg.DATALOADER.USE_GRAIN = False
        cfg.DATALOADER.NUM_WORKERS = 8

    def grain(cfg):
        cfg.DATALOADER.USE_GRAIN = True
        cfg.DATALOADER.NUM_WORKERS = 8

    bench(threaded, "threaded", root, n)
    bench(grain, "grain", root, n)


if __name__ == "__main__":
    main()
