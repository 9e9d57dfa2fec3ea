import json
import os

import numpy as np
from PIL import Image

from cvpr22_cross_modal_pseudo_labeling_tpu.data.datasets import (
    CityScapesDataset,
    PascalVOCDataset,
)


def test_cityscapes_dataset(tmp_path):
    img_dir = tmp_path / "leftImg8bit"
    ann_dir = tmp_path / "gtFine"
    (img_dir / "val" / "city1").mkdir(parents=True)
    (ann_dir / "val" / "city1").mkdir(parents=True)
    arr = np.zeros((64, 128, 3), np.uint8)
    Image.fromarray(arr).save(
        img_dir / "val" / "city1" / "x_000001_leftImg8bit.png"
    )
    ann = {
        "imgHeight": 64,
        "imgWidth": 128,
        "objects": [
            {"label": "car", "polygon": [[10, 10], [50, 10], [50, 40], [10, 40]]},
            {"label": "persongroup",
             "polygon": [[60, 10], [90, 10], [90, 50], [60, 50]]},
            {"label": "sky", "polygon": [[0, 0], [128, 0], [128, 10], [0, 10]]},
        ],
    }
    (ann_dir / "val" / "city1" / "x_000001_gtFine_polygons.json").write_text(
        json.dumps(ann)
    )
    ds = CityScapesDataset(str(img_dir), str(ann_dir), split="val")
    assert len(ds) == 1
    s = ds[0]
    assert s["boxes"].shape == (2, 4)  # car + persongroup; sky ignored
    assert set(s["labels"].tolist()) == {
        ds.class_to_ind["car"], ds.class_to_ind["person"]
    }
    assert s["gt_masks"].shape == (2, 28, 28)
    idx = ds.to_coco_index()
    assert len(idx.get_img_ids()) == 1
    assert len(idx.load_anns_for_image(0)) == 2


def test_voc_dataset(tmp_path):
    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "Annotations").mkdir()
    (tmp_path / "ImageSets" / "Main").mkdir(parents=True)
    Image.fromarray(np.zeros((50, 60, 3), np.uint8)).save(
        tmp_path / "JPEGImages" / "000001.jpg"
    )
    xml = """<annotation>
      <size><width>60</width><height>50</height><depth>3</depth></size>
      <object><name>dog</name><difficult>0</difficult>
        <bndbox><xmin>5</xmin><ymin>5</ymin><xmax>30</xmax><ymax>40</ymax></bndbox>
      </object>
      <object><name>cat</name><difficult>1</difficult>
        <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>10</xmax><ymax>10</ymax></bndbox>
      </object>
    </annotation>"""
    (tmp_path / "Annotations" / "000001.xml").write_text(xml)
    (tmp_path / "ImageSets" / "Main" / "val.txt").write_text("000001\n")
    ds = PascalVOCDataset(str(tmp_path), "val")
    assert len(ds) == 1
    s = ds[0]
    # difficult cat skipped by default
    assert s["boxes"].shape == (1, 4)
    assert ds.class_names[s["labels"][0]] == "dog"
    info = ds.get_img_info(0)
    assert info["height"] == 50 and info["width"] == 60
