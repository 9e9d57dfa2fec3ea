#!/usr/bin/env python
"""Generates a synthetic COCO zero-shot tree at PRODUCTION image sizes.

The driver/judge synthetic tree from the verify skill uses 64x64
images, which exercises correctness but not the production host
pipeline (JPEG decode, resize, bucket padding).  This tool writes a
tree with the same layout as preprocess/coco/construct_coco_json.py's
output (reference preprocess/coco/construct_coco_json.py:262-308 —
per-category ``embedding.BertEmb`` + ``split`` tags) but with:

- images at a realistic COCO size/aspect mix (640x480-class landscape,
  480x640 portrait, near-square), saved as real JPEGs with smooth
  photo-like content so decode cost is representative;
- 48 seen + 17 unseen categories (the reference zero-shot partition
  sizes, README.md:29) with random 768-d embeddings;
- 1-8 polygon instances per image;
- a captions file whose captions contain LVIS nouns, so the cap-det /
  ST configs run against the same tree.

Used by tools/bench_sustained.py to measure the real CLI pipeline on
the chip; also usable standalone:

  python tools/synth_coco.py --out /tmp/synth_coco --train 512 --val 200
"""

import argparse
import json
import os

import numpy as np
from PIL import Image

# (width, height, weight): rough COCO val2017 shape mix — most images
# are 640-wide landscape, a quarter portrait, a few near-square
SIZE_MIX = [
    ((640, 480), 0.45),
    ((640, 427), 0.20),
    ((500, 375), 0.05),
    ((480, 640), 0.15),
    ((427, 640), 0.10),
    ((612, 612), 0.05),
]

NOUNS = ["cat", "dog", "person", "car", "chair", "bottle", "bird", "horse"]


def photo_like(rng, w, h):
    """Smooth low-frequency content + mild noise: compresses to a
    realistic ~40-150 KB JPEG instead of noise (no compression) or
    flat color (trivial decode)."""
    small = rng.randint(0, 255, (h // 16 + 1, w // 16 + 1, 3), np.uint8)
    img = np.asarray(
        Image.fromarray(small).resize((w, h), Image.BILINEAR), np.int16
    )
    img = img + rng.randint(-12, 12, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_images(rng, root, split, n, quality):
    os.makedirs(f"{root}/{split}", exist_ok=True)
    sizes, weights = zip(*SIZE_MIX)
    images = []
    for i in range(n):
        w, h = sizes[rng.choice(len(sizes), p=np.asarray(weights))]
        fn = f"{split}_{i:06d}.jpg"
        Image.fromarray(photo_like(rng, w, h)).save(
            f"{root}/{split}/{fn}", quality=quality
        )
        images.append({"id": i + 1, "file_name": fn, "width": w, "height": h})
    return images


def make_anns(rng, images, cat_ids, start_id=1):
    anns, aid = [], start_id
    for im in images:
        for _ in range(rng.randint(1, 9)):
            c = int(cat_ids[rng.randint(len(cat_ids))])
            w = float(rng.randint(24, max(im["width"] // 2, 32)))
            h = float(rng.randint(24, max(im["height"] // 2, 32)))
            x = float(rng.randint(0, max(int(im["width"] - w), 1)))
            y = float(rng.randint(0, max(int(im["height"] - h), 1)))
            # hexagonal polygon inside the box: non-rectangular masks
            # so paste/RLE paths see realistic boundaries
            px = [x + w * f for f in (0.25, 0.75, 1.0, 0.75, 0.25, 0.0)]
            py = [y + h * f for f in (0.0, 0.0, 0.5, 1.0, 1.0, 0.5)]
            poly = [v for pair in zip(px, py) for v in pair]
            anns.append(
                {
                    "id": aid,
                    "image_id": im["id"],
                    "category_id": c,
                    "bbox": [x, y, w, h],
                    "area": w * h * 0.75,
                    "iscrowd": 0,
                    "segmentation": [poly],
                }
            )
            aid += 1
    return anns


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/synth_coco")
    p.add_argument("--train", type=int, default=512)
    p.add_argument("--val", type=int, default=200)
    p.add_argument("--seen", type=int, default=48)
    p.add_argument("--unseen", type=int, default=17)
    p.add_argument("--quality", type=int, default=85)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.RandomState(args.seed)
    root = f"{args.out}/coco"
    os.makedirs(f"{root}/zero-shot", exist_ok=True)
    os.makedirs(f"{root}/annotations", exist_ok=True)

    cats = []
    for i in range(args.seen + args.unseen):
        cats.append(
            {
                "id": i + 1,
                "name": NOUNS[i % len(NOUNS)] if i < len(NOUNS)
                else f"thing_{i}",
                "split": "seen" if i < args.seen else "unseen",
                "embedding": {"BertEmb": (0.1 * rng.randn(768)).tolist()},
            }
        )
    seen = [c for c in cats if c["split"] == "seen"]
    unseen = [c for c in cats if c["split"] == "unseen"]

    train_imgs = make_images(rng, root, "train2017", args.train, args.quality)
    val_imgs = make_images(rng, root, "val2017", args.val, args.quality)

    specs = {
        "instances_train2017_seen_2.json": (train_imgs, seen),
        "instances_val2017_seen_2.json": (val_imgs, seen),
        "instances_val2017_unseen_2.json": (val_imgs, unseen),
        "instances_val2017_all_2.json": (val_imgs, cats),
    }
    for fn, (imgs, cc) in specs.items():
        blob = {
            "images": imgs,
            "categories": cc,
            "annotations": make_anns(rng, imgs, [c["id"] for c in cc]),
        }
        with open(f"{root}/zero-shot/{fn}", "w") as f:
            json.dump(blob, f)

    caps = {
        "images": train_imgs,
        "annotations": [
            {
                "id": 10_000_000 + im["id"],
                "image_id": im["id"],
                "caption": "a %s and a %s near a %s"
                % tuple(NOUNS[j % len(NOUNS)]
                        for j in rng.randint(0, len(NOUNS), 3)),
            }
            for im in train_imgs
        ],
    }
    with open(f"{root}/annotations/captions_train2017.json", "w") as f:
        json.dump(caps, f)

    n_bytes = sum(
        os.path.getsize(f"{root}/{s}/{im['file_name']}")
        for s, imgs in (("train2017", train_imgs), ("val2017", val_imgs))
        for im in imgs
    )
    print(
        f"wrote {args.out}: {args.train} train + {args.val} val images, "
        f"{len(cats)} cats, {n_bytes / 1e6:.1f} MB jpeg"
    )


if __name__ == "__main__":
    main()
