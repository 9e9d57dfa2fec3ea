#!/usr/bin/env python
"""Host data-pipeline stage profile: where does the per-image time go?

The sustained CLI bench (tools/bench_sustained.py) showed the host
loader is the single-core bottleneck; this tool times each stage —
JPEG decode, resize, flip, normalize, GT-mask rasterization, collate —
over the synthetic production-size tree so optimization targets the
right stage.  The reference's only analogue is the trainer data-time
meter (engine/trainer.py:99).

  python tools/profile_host_pipeline.py [--data /tmp/synth_coco] [-n 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="/tmp/synth_coco")
    p.add_argument("-n", type=int, default=64)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--device-normalize", action="store_true", default=True)
    p.add_argument("--host-normalize", dest="device_normalize",
                   action="store_false")
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.datasets.coco import (
        COCODataset,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.transforms import (
        build_transforms,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.collate import (
        BatchCollator,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.utils.native_image import (
        load_image_rgb,
    )

    cfg = get_default_cfg()
    cfg.INPUT.DEVICE_NORMALIZE = args.device_normalize
    ann = os.path.join(
        args.data, "coco/zero-shot/instances_train2017_seen_2.json"
    )
    root = os.path.join(args.data, "coco/train2017")
    tf = build_transforms(cfg, is_train=True)
    ds = COCODataset(
        ann, root, remove_images_without_annotations=True, transforms=tf,
    )
    n = min(args.n, len(ds))

    # Per-image staging with only scalars retained: holding n float32
    # production-size images (12.8 MB each) at once causes memory
    # thrash that inflates the host-normalize numbers ~40x.
    import random

    rng = random.Random(0)
    collator = BatchCollator.from_cfg(cfg)
    t_decode = t_raw = t_tf = t_item = t_collate = 0.0
    batch_buf = []
    for i in range(n):
        path = os.path.join(
            root, ds.coco.imgs[ds.id_to_img_map[i]]["file_name"]
        )
        t0 = time.perf_counter()
        load_image_rgb(path)
        t_decode += time.perf_counter() - t0

        # raw sample (decode + ann parse + mask rasterize)
        t0 = time.perf_counter()
        raw = ds.raw_sample(i)
        t_raw += time.perf_counter() - t0

        # transforms (resize/flip/normalize-or-defer)
        t0 = time.perf_counter()
        ds._transforms(dict(raw), rng)
        t_tf += time.perf_counter() - t0
        del raw

        # full __getitem__ (end-to-end per sample)
        t0 = time.perf_counter()
        batch_buf.append(ds[i])
        t_item += time.perf_counter() - t0

        if len(batch_buf) == args.batch:
            t0 = time.perf_counter()
            collator(batch_buf)
            t_collate += time.perf_counter() - t0
            batch_buf = []

    ms = lambda t: 1000.0 * t / n
    print(f"images: {n}  (device_normalize={args.device_normalize})")
    print(f"decode            {ms(t_decode):8.2f} ms/img")
    print(f"raw_sample        {ms(t_raw):8.2f} ms/img "
          f"(ann+masks {ms(t_raw - t_decode):.2f})")
    print(f"transforms        {ms(t_tf):8.2f} ms/img")
    print(f"__getitem__       {ms(t_item):8.2f} ms/img")
    print(f"collate           {ms(t_collate):8.2f} ms/img")
    total = ms(t_item + t_collate)
    print(f"TOTAL             {total:8.2f} ms/img "
          f"-> {1000.0 / total:.1f} imgs/s/core")


if __name__ == "__main__":
    main()
