#!/usr/bin/env python
"""Bucket-mix training efficiency: the weighted sustained MFU of a
real COCO run across cfg.TPU.IMAGE_BUCKETS.

Round-3 train benches measured one shape (800x1344).  A real COCO
epoch draws from an aspect-ratio distribution — the reference's
aspect-ratio grouping (data/build.py:115-192,
grouped_batch_sampler.py:9-115) exists precisely to batch same-aspect
images — so the production number is the mix-weighted one, including
the padding tax of each bucket.

Aspect mix: the production-size synthetic COCO tree's SIZE_MIX
(tools/synth_coco.py:36-42, itself a documented approximation of the
COCO val2017 shape histogram — 45% 640x480, 20% 640x427, 5% 500x375,
15% 480x640, 10% 427x640, 5% 612x612).  After the reference Resize
(min 800 / max 1333) each class selects one rung of the default
TPU.IMAGE_BUCKETS ladder (DATALOADER.GROUP_BY_BUCKET batches are
bucket-homogeneous, so each class really does step at its own rung).

Run with BENCH_BUCKETS=legacy to measure the pre-round-4 3-bucket set
(the reference-style coarse grouping): there the whole landscape class
rides (800, 1333) and the tax is ~15% (BENCH_NOTES round4_bucket_mix).

  python tools/bench_bucket_mix.py [batch]

Prints one JSON line with per-bucket rates and the weighted number.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (bucket HxW exactly as cfg.TPU.IMAGE_BUCKETS selects them
# (data/collate.py:select_bucket), representative true image HxW,
# weight).  Weights follow synth_coco.SIZE_MIX; representatives are
# the post-Resize shapes of each size class.
MIX_LADDER = [
    ((800, 1088), (800, 1066), 0.50),    # 4:3 landscape (640x480, 500x375)
    ((800, 1216), (800, 1199), 0.20),    # 3:2 landscape (640x427)
    ((1088, 800), (1066, 800), 0.15),    # 3:4 portrait
    ((1216, 800), (1199, 800), 0.10),    # 2:3 portrait
    ((800, 1088), (800, 800), 0.05),     # square (smallest fitting rung)
]
# legacy = the SAME five SIZE_MIX classes routed through the
# pre-round-4 3-bucket set (same weight basis and representatives as
# MIX_LADDER, so legacy-vs-ladder isolates the bucket-set change only
# — advisor r4: the old form mixed measured-COCO weights with
# SIZE_MIX weights)
MIX_LEGACY = [
    ((800, 1333), (800, 1066), 0.50),    # 4:3 landscape
    ((800, 1333), (800, 1199), 0.20),    # 3:2 landscape
    ((1333, 800), (1066, 800), 0.15),    # 3:4 portrait
    ((1333, 800), (1199, 800), 0.10),    # 2:3 portrait
    ((1024, 1024), (800, 800), 0.05),    # square
]
MIX = (
    MIX_LEGACY if os.environ.get("BENCH_BUCKETS") == "legacy"
    else MIX_LADDER
)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import bench

    rows = []
    for bucket, image_hw, weight in MIX:
        r = bench.headline(
            batch, emit=False, bucket=bucket, image_hw=image_hw
        )
        rows.append(
            {
                "bucket": list(bucket),
                "image_hw": list(image_hw),
                "weight": weight,
                "imgs_per_sec": r["value"],
                "mfu_pct": r.get("mfu_pct"),
                "flops_per_step": r.get("flops_per_step"),
                "content_fraction": round(
                    (image_hw[0] * image_hw[1])
                    / float(bucket[0] * bucket[1]),
                    3,
                ),
            }
        )
        print(json.dumps({"bucket_done": rows[-1]}), file=sys.stderr)

    wsum = sum(w for _, _, w in MIX)
    # weighted harmonic rate: time-per-image averaged over the mix
    t_img = sum(
        row["weight"] / row["imgs_per_sec"] for row in rows
    ) / wsum
    weighted_imgs = 1.0 / t_img
    mfu_rows = [r for r in rows if r.get("mfu_pct")]
    weighted_mfu = (
        sum(
            r["weight"] * r["mfu_pct"] * weighted_imgs / r["imgs_per_sec"]
            for r in mfu_rows
        )
        / wsum
        if mfu_rows
        else None
    )
    # fraction of conv FLOPs spent on bucket padding, mix-weighted
    padding_tax = 1.0 - sum(
        r["weight"] * r["content_fraction"] for r in rows
    ) / wsum

    out = {
        "metric": "bucket_mix_train_imgs_per_sec_per_chip",
        "value": round(weighted_imgs, 3),
        "unit": "imgs/sec/chip (COCO aspect-mix weighted)",
        "weighted_mfu_pct": round(weighted_mfu, 2) if weighted_mfu else None,
        "padding_tax_pct": round(100 * padding_tax, 1),
        "batch": batch,
        "buckets": rows,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
