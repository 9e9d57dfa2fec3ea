#!/usr/bin/env python
"""Builds the Conceptual Captions index JSON.

Re-design of reference preprocess/conceptual/extract_conceptual_cap_meta.py:
walks a downloaded Conceptual Captions TSV (caption<TAB>url) plus the
image directory, records which images exist, and writes the index the
ConCapDetDataset consumes: a list of {id, file_name, caption, height,
width}.
"""

import argparse
import csv
import json
import os

from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", required=True, help="captions TSV")
    p.add_argument("--images", required=True, help="image directory")
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    items = []
    with open(args.tsv) as f:
        reader = csv.reader(f, delimiter="\t")
        for i, row in enumerate(reader):
            if args.limit and len(items) >= args.limit:
                break
            caption = row[0]
            fname = f"{i:08d}.jpg"
            path = os.path.join(args.images, fname)
            if not os.path.exists(path):
                continue
            try:
                with Image.open(path) as im:
                    w, h = im.size
            except OSError:
                continue
            items.append(
                {
                    "id": i,
                    "file_name": fname,
                    "caption": caption,
                    "height": h,
                    "width": w,
                }
            )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(items, f)
    print(f"wrote {args.out}: {len(items)} items")


if __name__ == "__main__":
    main()
