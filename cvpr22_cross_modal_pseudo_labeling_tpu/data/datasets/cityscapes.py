"""Cityscapes instance-segmentation dataset.

Re-design of reference data/datasets/cityscapes.py (AbstractDataset
subclass): walks a gtFine split directory, reads *_polygons.json per
image, keeps the 8 instance ("thing") classes, and produces the common
numpy sample schema.  Evaluation flows through the COCO-protocol
evaluator by converting to a CocoIndex (``to_coco_index``), mirroring
the reference's abs_to_coco.py conversion wrapper.
"""

import glob
import json
import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from ...core.boxes import TO_REMOVE
from .coco import rasterize_instance_mask

from ..rng import visit_rng

CITYSCAPES_THING_CLASSES = (
    "__background__", "person", "rider", "car", "truck", "bus",
    "train", "motorcycle", "bicycle",
)


class CityScapesDataset:
    def __init__(
        self,
        img_dir: str,
        ann_dir: str,
        split: str = "train",
        transforms=None,
        extra_args: Optional[dict] = None,
        min_area: float = 16.0,
    ):
        self.img_dir = os.path.join(img_dir, split)
        self.ann_dir = os.path.join(ann_dir, split)
        self._transforms = transforms
        self.class_to_ind = {
            c: i for i, c in enumerate(CITYSCAPES_THING_CLASSES)
        }
        self.class_names = list(CITYSCAPES_THING_CLASSES)
        self.categories = {
            i: c
            for i, c in enumerate(CITYSCAPES_THING_CLASSES)
            if i > 0
        }
        self.min_area = min_area
        self.ann_files = sorted(
            glob.glob(
                os.path.join(self.ann_dir, "*", "*_polygons.json")
            )
        )
        self.id_to_img_map = dict(enumerate(range(len(self.ann_files))))

    def __len__(self):
        return len(self.ann_files)

    def _image_path(self, ann_file: str) -> str:
        city = os.path.basename(os.path.dirname(ann_file))
        stem = os.path.basename(ann_file).replace(
            "_gtFine_polygons.json", "_leftImg8bit.png"
        )
        return os.path.join(self.img_dir, city, stem)

    def _parse(self, ann_file: str):
        with open(ann_file) as f:
            data = json.load(f)
        boxes, labels, polys = [], [], []
        for obj in data.get("objects", []):
            name = obj.get("label", "")
            if name.endswith("group"):
                name = name[: -len("group")]
            if name not in self.class_to_ind or name == "__background__":
                continue
            pts = np.asarray(obj["polygon"], np.float32)
            x1, y1 = pts.min(axis=0)
            x2, y2 = pts.max(axis=0)
            if (x2 - x1) * (y2 - y1) < self.min_area:
                continue
            boxes.append([x1, y1, x2, y2])
            labels.append(self.class_to_ind[name])
            polys.append([pts.reshape(-1).tolist()])
        return (
            np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(labels, np.int64),
            polys,
            data.get("imgHeight", 1024),
            data.get("imgWidth", 2048),
        )

    def get_img_info(self, index: int) -> dict:
        ann_file = self.ann_files[index]
        _, _, _, h, w = self._parse(ann_file)
        return {
            "id": index,
            "height": h,
            "width": w,
            "file_name": os.path.basename(self._image_path(ann_file)),
        }

    def __getitem__(self, index: int) -> Dict:
        ann_file = self.ann_files[index]
        with Image.open(self._image_path(ann_file)) as im:
            image = np.asarray(im.convert("RGB"), np.float32) / 255.0
        boxes, labels, polys, h, w = self._parse(ann_file)
        gt_masks = (
            np.stack(
                [
                    rasterize_instance_mask(p, b, (h, w), 28)
                    for p, b in zip(polys, boxes)
                ]
            )
            if len(boxes)
            else np.zeros((0, 28, 28), np.float32)
        )
        sample = {
            "image": image,
            "boxes": boxes,
            "labels": labels,
            "gt_masks": gt_masks,
            "image_id": index,
            "is_det": "Yes",
            "caption": "",
            "nn_caption": "",
            "ids_cap": [],
        }
        if self._transforms is not None:
            rng = visit_rng(index)
            sample = self._transforms(sample, rng)
        return sample

    @property
    def coco(self):
        if getattr(self, "_coco_index", None) is None:
            self._coco_index = self.to_coco_index()
        return self._coco_index

    def to_coco_index(self):
        """COCO-format view for the evaluator (abs_to_coco.py
        equivalent)."""
        from ..coco_index import CocoIndex
        from ...utils.rle import polygons_to_mask, encode_mask

        images, annotations = [], []
        aid = 1
        for idx, ann_file in enumerate(self.ann_files):
            boxes, labels, polys, h, w = self._parse(ann_file)
            images.append(
                {
                    "id": idx,
                    "file_name": os.path.basename(
                        self._image_path(ann_file)
                    ),
                    "height": h,
                    "width": w,
                }
            )
            for b, l, p in zip(boxes, labels, polys):
                annotations.append(
                    {
                        "id": aid,
                        "image_id": idx,
                        "category_id": int(l),
                        "bbox": [
                            float(b[0]),
                            float(b[1]),
                            float(b[2] - b[0] + TO_REMOVE),
                            float(b[3] - b[1] + TO_REMOVE),
                        ],
                        "area": float(
                            (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
                        ),
                        "iscrowd": 0,
                        "segmentation": encode_mask(
                            polygons_to_mask(p, h, w)
                        ),
                    }
                )
                aid += 1
        index = CocoIndex.__new__(CocoIndex)
        index.dataset = {
            "images": images,
            "annotations": annotations,
            "categories": [
                {"id": i, "name": n} for i, n in self.categories.items()
            ],
        }
        index.imgs = {im["id"]: im for im in images}
        index.anns = {a["id"]: a for a in annotations}
        index.cats = {
            c["id"]: c for c in index.dataset["categories"]
        }
        from collections import defaultdict

        index.img_to_anns = defaultdict(list)
        for a in annotations:
            index.img_to_anns[a["image_id"]].append(a)
        return index
