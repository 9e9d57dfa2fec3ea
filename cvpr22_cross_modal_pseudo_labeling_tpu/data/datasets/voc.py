"""Pascal VOC dataset (upstream parity; reference data/datasets/voc.py).

Parses VOC XML annotations into the same numpy sample schema as
COCODataset.  Evaluated through evaluation/voc_eval.py.
"""

import os
import random
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

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
        self.id_to_img_map = dict(enumerate(self.ids))
        self.class_to_ind = {c: i for i, c in enumerate(VOC_CLASSES)}
        self.class_names = list(VOC_CLASSES)
        self.categories = {
            i: c for i, c in enumerate(VOC_CLASSES) if i > 0
        }

    def __len__(self):
        return len(self.ids)

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
        img_id = self.id_to_img_map[index]
        tree = ET.parse(os.path.join(self._ann_dir, f"{img_id}.xml"))
        size = tree.find("size")
        return {
            "id": index,
            "height": int(size.findtext("height")),
            "width": int(size.findtext("width")),
            "file_name": f"{img_id}.jpg",
        }

    def __getitem__(self, index: int) -> Dict:
        img_id = self.id_to_img_map[index]
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
            rng = random.Random(hash((index, os.getpid())) & 0xFFFFFFFF)
            sample = self._transforms(sample, rng)
        return sample
