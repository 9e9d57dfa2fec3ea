#!/usr/bin/env python
"""Builds the Conceptual Captions index JSON.

Re-design of reference preprocess/conceptual/extract_conceptual_cap_meta.py:
walks a downloaded Conceptual Captions TSV (caption<TAB>url) plus the
image directory, records which images exist, and writes the index the
ConCapDetDataset consumes: a list of {id, file_name, caption, height,
width}.

The full corpus is ~3.3M images, so like the reference the extraction
shards across jobs (the reference hardcodes 40 partitions and merges
the pickles with merge_conceptual_cap_meta.py; here ``--shard K/N``
selects rows ``i % N == K`` and ``--merge`` concatenates the shard
JSONs into the final index):

  extract_conceptual_meta.py --tsv t.tsv --images d/ --out m.3.8.json --shard 3/8
  extract_conceptual_meta.py --merge 'm.*.8.json' --out meta.json
"""

import argparse
import csv
import glob
import json
import os

from PIL import Image


def merge(pattern: str, out_path: str) -> int:
    """Concatenates shard index JSONs (reference
    merge_conceptual_cap_meta.py: per-partition dict update) into one
    index sorted by id; duplicate ids keep the last occurrence, matching
    the reference's dict.update semantics."""
    def shard_index(path):
        # m.<K>.<N>.json -> K; numeric order matches the reference's
        # range(n_partition) merge order even for N > 9 shards.
        parts = os.path.basename(path).split(".")
        for part in parts:
            if part.isdigit():
                return int(part)
        return -1

    by_id = {}
    paths = sorted(glob.glob(pattern), key=lambda p: (shard_index(p), p))
    if not paths:
        raise SystemExit(f"--merge matched no files: {pattern}")
    for path in paths:
        with open(path) as f:
            for item in json.load(f):
                by_id[item["id"]] = item
    items = [by_id[i] for i in sorted(by_id)]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(items, f)
    print(f"wrote {out_path}: {len(items)} items from {len(paths)} shards")
    return len(items)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", help="captions TSV")
    p.add_argument("--images", help="image directory")
    p.add_argument("--out", required=True)
    p.add_argument(
        "--limit", type=int, default=0,
        help="stop after this many items; applied PER SHARD when "
             "combined with --shard (a merged run can hold up to "
             "limit*N items)",
    )
    p.add_argument(
        "--shard", default="",
        help="K/N: only process TSV rows with index %% N == K",
    )
    p.add_argument(
        "--merge", default="",
        help="glob of shard JSONs to concatenate into --out (no "
             "extraction; --tsv/--images unused)",
    )
    args = p.parse_args()

    if args.merge:
        merge(args.merge, args.out)
        return
    if not args.tsv or not args.images:
        p.error("--tsv and --images are required unless --merge is given")
    shard_k, shard_n = 0, 1
    if args.shard:
        try:
            shard_k, shard_n = (int(x) for x in args.shard.split("/"))
        except ValueError:
            p.error(f"bad --shard {args.shard!r}: expected K/N")
        if shard_n <= 0 or not 0 <= shard_k < shard_n:
            p.error(f"bad --shard {args.shard}")

    items = []
    with open(args.tsv) as f:
        reader = csv.reader(f, delimiter="\t")
        for i, row in enumerate(reader):
            if args.limit and len(items) >= args.limit:
                break
            if i % shard_n != shard_k:
                continue
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
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(items, f)
    print(f"wrote {args.out}: {len(items)} items")


if __name__ == "__main__":
    main()
