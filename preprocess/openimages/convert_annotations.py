#!/usr/bin/env python
"""OpenImages CSV annotations -> COCO-format JSON.

Re-design of reference preprocess/openimages/openimages2coco/
convert_annotations.py: reads the boxable class descriptions
(MID -> display name), the box CSV, and optionally the instance-
segmentation CSV, and emits a COCO-format JSON with absolute pixel
boxes, ``freebase_id`` per category, and ``iseg_file_name`` per
annotation when a mask PNG exists.
"""

import argparse
import csv
import json
import os

from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--class-descriptions", required=True)
    p.add_argument("--boxes-csv", required=True)
    p.add_argument("--masks-csv", default=None)
    p.add_argument("--images", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    mid_to_name = {}
    with open(args.class_descriptions) as f:
        for row in csv.reader(f):
            if len(row) >= 2:
                mid_to_name[row[0]] = row[1]

    categories = []
    mid_to_cid = {}
    for i, (mid, name) in enumerate(sorted(mid_to_name.items())):
        cid = i + 1
        mid_to_cid[mid] = cid
        categories.append(
            {"id": cid, "name": name, "freebase_id": mid}
        )

    mask_by_box = {}
    if args.masks_csv and os.path.exists(args.masks_csv):
        with open(args.masks_csv) as f:
            for row in csv.DictReader(f):
                mask_by_box[row.get("BoxID", row.get("MaskPath", ""))] = (
                    row.get("MaskPath", "")
                )

    images, annotations = [], []
    img_ids = {}
    with open(args.boxes_csv) as f:
        for row in csv.DictReader(f):
            name = row["ImageID"]
            if name not in img_ids:
                path = os.path.join(args.images, name + ".jpg")
                if not os.path.exists(path):
                    continue
                with Image.open(path) as im:
                    w, h = im.size
                img_ids[name] = len(img_ids) + 1
                images.append(
                    {
                        "id": img_ids[name],
                        "file_name": name + ".jpg",
                        "height": h,
                        "width": w,
                    }
                )
            info = images[img_ids[name] - 1]
            w, h = info["width"], info["height"]
            x1 = float(row["XMin"]) * w
            x2 = float(row["XMax"]) * w
            y1 = float(row["YMin"]) * h
            y2 = float(row["YMax"]) * h
            mid = row["LabelName"]
            if mid not in mid_to_cid:
                continue
            ann = {
                "id": len(annotations) + 1,
                "image_id": img_ids[name],
                "category_id": mid_to_cid[mid],
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "area": (x2 - x1) * (y2 - y1),
                "iscrowd": int(row.get("IsGroupOf", "0") == "1"),
            }
            box_id = row.get("BoxID", "")
            if box_id in mask_by_box:
                ann["iseg_file_name"] = mask_by_box[box_id]
            annotations.append(ann)

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
