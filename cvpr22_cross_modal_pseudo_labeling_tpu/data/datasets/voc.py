"""Pascal VOC dataset (upstream parity; reference data/datasets/voc.py).

Parses VOC XML annotations into the same numpy sample schema as
COCODataset.  Evaluated through evaluation/voc_eval.py.
"""

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from ..rng import visit_rng

VOC_CLASSES = (
    "__background__", "aeroplane", "bicycle", "bird", "boat", "bottle",
    "bus", "car", "cat", "chair", "cow", "diningtable", "dog", "horse",
    "motorbike", "person", "pottedplant", "sheep", "sofa", "train",
    "tvmonitor",
)


class PascalVOCDataset:
    def __init__(
        self,
        data_dir: str,
        split: str,
        use_difficult: bool = False,
        transforms=None,
        extra_args: Optional[dict] = None,
    ):
        self.root = data_dir
        self.image_set = split
        self.keep_difficult = use_difficult
        self._transforms = transforms
        self._img_dir = os.path.join(data_dir, "JPEGImages")
        self._ann_dir = os.path.join(data_dir, "Annotations")
        split_file = os.path.join(
            data_dir, "ImageSets", "Main", f"{split}.txt"
        )
        with open(split_file) as f:
            self.ids = [line.strip() for line in f if line.strip()]
        # integer ids for the eval stack (VOC ids are strings); the
        # string id is only a path component
        self.id_to_img_map = {i: i for i in range(len(self.ids))}
        self.class_to_ind = {c: i for i, c in enumerate(VOC_CLASSES)}
        self.class_names = list(VOC_CLASSES)
        self.categories = {
            i: c for i, c in enumerate(VOC_CLASSES) if i > 0
        }

    eval_protocol = "voc"  # reference: voc datasets use the VOC metric

    def __len__(self):
        return len(self.ids)

    @property
    def coco(self):
        """CocoIndex view for the eval stack: integer image ids,
        difficult objects as iscrowd (the VOC 'ignore' semantics the
        evaluator consumes, voc_eval.py)."""
        if getattr(self, "_coco_index", None) is None:
            self._coco_index = self._build_coco_index()
        return self._coco_index

    def _build_coco_index(self):
        from collections import defaultdict

        from ..coco_index import CocoIndex

        images, annotations = [], []
        aid = 1
        for idx, img_id in enumerate(self.ids):
            info = self.get_img_info(idx)
            images.append(
                {
                    "id": idx,
                    "file_name": f"{img_id}.jpg",
                    "height": info["height"],
                    "width": info["width"],
                }
            )
            tree = ET.parse(
                os.path.join(self._ann_dir, f"{img_id}.xml")
            )
            for obj in tree.findall("object"):
                name = obj.findtext("name", "").lower().strip()
                bb = obj.find("bndbox")
                x1 = float(bb.findtext("xmin")) - 1
                y1 = float(bb.findtext("ymin")) - 1
                x2 = float(bb.findtext("xmax")) - 1
                y2 = float(bb.findtext("ymax")) - 1
                annotations.append(
                    {
                        "id": aid,
                        "image_id": idx,
                        "category_id": self.class_to_ind.get(name, 0),
                        "bbox": [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                        "area": (x2 - x1 + 1) * (y2 - y1 + 1),
                        "iscrowd": int(
                            int(obj.findtext("difficult", "0")) == 1
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
        index.cats = {c["id"]: c for c in index.dataset["categories"]}
        index.img_to_anns = defaultdict(list)
        for a in annotations:
            index.img_to_anns[a["image_id"]].append(a)
        return index

    def _parse_annotation(self, img_id: str):
        tree = ET.parse(os.path.join(self._ann_dir, f"{img_id}.xml"))
        boxes, labels, difficult = [], [], []
        for obj in tree.findall("object"):
            is_difficult = int(obj.findtext("difficult", "0")) == 1
            if is_difficult and not self.keep_difficult:
                continue
            name = obj.findtext("name", "").lower().strip()
            bb = obj.find("bndbox")
            # VOC is 1-indexed
            box = [
                float(bb.findtext("xmin")) - 1,
                float(bb.findtext("ymin")) - 1,
                float(bb.findtext("xmax")) - 1,
                float(bb.findtext("ymax")) - 1,
            ]
            boxes.append(box)
            labels.append(self.class_to_ind.get(name, 0))
            difficult.append(is_difficult)
        return (
            np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(labels, np.int64),
            np.asarray(difficult, bool),
        )

    def get_img_info(self, index: int) -> dict:
        img_id = self.ids[index]
        tree = ET.parse(os.path.join(self._ann_dir, f"{img_id}.xml"))
        size = tree.find("size")
        return {
            "id": index,
            "height": int(size.findtext("height")),
            "width": int(size.findtext("width")),
            "file_name": f"{img_id}.jpg",
        }

    def __getitem__(self, index: int) -> Dict:
        img_id = self.ids[index]
        with Image.open(
            os.path.join(self._img_dir, f"{img_id}.jpg")
        ) as im:
            image = np.asarray(im.convert("RGB"), np.float32) / 255.0
        boxes, labels, _ = self._parse_annotation(img_id)
        sample = {
            "image": image,
            "boxes": boxes,
            "labels": labels,
            "gt_masks": np.zeros((len(boxes), 28, 28), np.float32),
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
