#!/usr/bin/env python
"""Builds the zero-shot OpenImages annotation JSONs.

Re-design of reference preprocess/openimages/construct_openimages_json.py:
takes an OpenImages-as-COCO JSON (from convert_annotations), tags each
category seen/unseen using the 200/300 split lists (shipped as package
resources, mirrored from the reference's
datasets/openimages/zero-shot/openimages_{seen,unseen}_classes_200.json),
attaches BERT class-name embeddings, and writes the filtered JSON.
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)

RESOURCE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "cvpr22_cross_modal_pseudo_labeling_tpu",
    "data",
    "resources",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann", required=True, help="COCO-format OpenImages JSON")
    p.add_argument("--out", required=True)
    p.add_argument(
        "--keep", choices=["seen", "unseen", "all"], default="seen"
    )
    p.add_argument("--bert-weights", default=None)
    p.add_argument("--emb-key", default="BertEmb")
    args = p.parse_args()

    with open(os.path.join(RESOURCE_DIR, "openimages_seen_classes_200.json")) as f:
        seen = set(json.load(f))
    with open(
        os.path.join(RESOURCE_DIR, "openimages_unseen_classes_200.json")
    ) as f:
        unseen = set(json.load(f))

    with open(args.ann) as f:
        data = json.load(f)

    from preprocess.coco.construct_coco_json import embed_class_names

    embs = embed_class_names(
        [c["name"] for c in data["categories"]], args.bert_weights
    )

    def split_of(name):
        if name in seen:
            return "seen"
        if name in unseen:
            return "unseen"
        return None

    keep = {
        "seen": lambda s: s == "seen",
        "unseen": lambda s: s == "unseen",
        "all": lambda s: s is not None,
    }[args.keep]

    categories = []
    for c in data["categories"]:
        s = split_of(c["name"])
        if not keep(s):
            continue
        c = dict(c)
        c["split"] = s
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
