"""CLI-level tests for the three preprocess pipelines (reference
preprocess/{coco,openimages,conceptual} — rebuilt offline-capable).

Each script is driven as a subprocess on a tiny synthetic input tree and
the emitted JSON is checked for the exact structure the dataset classes
consume (data/datasets/coco.py, openimages.py, conceptual.py).
"""

import csv
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(script, *args):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "preprocess", script), *args],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def _raw_coco(tmp_path):
    cats = [
        {"id": 1, "name": "person"},       # seen
        {"id": 2, "name": "cat"},          # unseen
        {"id": 3, "name": "strawberry"},   # neither -> dropped
    ]
    images = [
        {"id": 10, "file_name": "a.jpg", "height": 32, "width": 32},
        {"id": 11, "file_name": "b.jpg", "height": 32, "width": 32},
        {"id": 12, "file_name": "c.jpg", "height": 32, "width": 32},
    ]
    anns = [
        {"id": 1, "image_id": 10, "category_id": 1,
         "bbox": [1, 1, 10, 10], "area": 100, "iscrowd": 0},
        {"id": 2, "image_id": 11, "category_id": 2,
         "bbox": [2, 2, 8, 8], "area": 64, "iscrowd": 0},
        {"id": 3, "image_id": 12, "category_id": 3,
         "bbox": [3, 3, 6, 6], "area": 36, "iscrowd": 0},
    ]
    raw = tmp_path / "instances_raw.json"
    raw.write_text(json.dumps(
        {"images": images, "annotations": anns, "categories": cats}
    ))
    return raw


@pytest.mark.parametrize("keep,names", [
    ("seen", {"person"}),
    ("unseen", {"cat"}),
    ("all", {"person", "cat"}),
])
def test_construct_coco_json_splits(tmp_path, keep, names):
    raw = _raw_coco(tmp_path)
    out = tmp_path / "zero-shot" / f"instances_{keep}.json"
    run(
        "coco/construct_coco_json.py",
        "--ann", str(raw), "--out", str(out), "--keep", keep,
    )
    data = json.loads(out.read_text())
    assert {c["name"] for c in data["categories"]} == names
    for c in data["categories"]:
        assert c["split"] == ("seen" if c["name"] == "person" else "unseen")
        emb = np.asarray(c["embedding"]["BertEmb"], np.float32)
        assert emb.shape == (768,) and np.isfinite(emb).all()
    kept_cids = {c["id"] for c in data["categories"]}
    assert all(a["category_id"] in kept_cids for a in data["annotations"])
    ann_img_ids = {a["image_id"] for a in data["annotations"]}
    assert {im["id"] for im in data["images"]} == ann_img_ids


def test_convert_openimages_annotations(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (40, 20)).save(img_dir / "img0.jpg")
    # img1 deliberately missing on disk -> its rows are skipped

    desc = tmp_path / "class-descriptions.csv"
    desc.write_text("/m/01g317,Person\n/m/0k4j,Car\n")
    boxes = tmp_path / "boxes.csv"
    with open(boxes, "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=[
            "ImageID", "LabelName", "XMin", "XMax", "YMin", "YMax",
            "IsGroupOf", "BoxID",
        ])
        wtr.writeheader()
        wtr.writerow({"ImageID": "img0", "LabelName": "/m/01g317",
                      "XMin": "0.1", "XMax": "0.5", "YMin": "0.25",
                      "YMax": "0.75", "IsGroupOf": "0", "BoxID": "b0"})
        wtr.writerow({"ImageID": "img0", "LabelName": "/m/0k4j",
                      "XMin": "0", "XMax": "1", "YMin": "0", "YMax": "1",
                      "IsGroupOf": "1", "BoxID": "b1"})
        wtr.writerow({"ImageID": "img1", "LabelName": "/m/0k4j",
                      "XMin": "0", "XMax": "1", "YMin": "0", "YMax": "1",
                      "IsGroupOf": "0", "BoxID": "b2"})
    masks = tmp_path / "masks.csv"
    with open(masks, "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=["BoxID", "MaskPath"])
        wtr.writeheader()
        wtr.writerow({"BoxID": "b0", "MaskPath": "img0_m0.png"})

    out = tmp_path / "oi" / "annotations.json"
    run(
        "openimages/convert_annotations.py",
        "--class-descriptions", str(desc), "--boxes-csv", str(boxes),
        "--masks-csv", str(masks), "--images", str(img_dir),
        "--out", str(out),
    )
    data = json.loads(out.read_text())
    assert len(data["images"]) == 1 and data["images"][0]["width"] == 40
    assert {c["freebase_id"] for c in data["categories"]} == {
        "/m/01g317", "/m/0k4j"
    }
    assert len(data["annotations"]) == 2  # img1 rows skipped
    a0 = data["annotations"][0]
    # normalized [0.1, 0.5]x[0.25, 0.75] of a 40x20 image
    np.testing.assert_allclose(a0["bbox"], [4.0, 5.0, 16.0, 10.0])
    assert a0["iseg_file_name"] == "img0_m0.png"
    assert data["annotations"][1]["iscrowd"] == 1


def test_construct_openimages_json_embeddings(tmp_path):
    base = {
        "images": [
            {"id": 1, "file_name": "x.jpg", "height": 8, "width": 8}
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [0, 0, 4, 4], "area": 16, "iscrowd": 0}
        ],
        "categories": [
            {"id": 1, "name": "Person", "freebase_id": "/m/01g317"}
        ],
    }
    raw = tmp_path / "oi_raw.json"
    raw.write_text(json.dumps(base))
    out = tmp_path / "zs" / "oi.json"
    run(
        "openimages/construct_openimages_json.py",
        "--ann", str(raw), "--out", str(out),
    )
    data = json.loads(out.read_text())
    emb = np.asarray(
        data["categories"][0]["embedding"]["BertEmb"], np.float32
    )
    assert emb.shape == (768,) and np.isfinite(emb).all()


def test_extract_conceptual_meta(tmp_path):
    img_dir = tmp_path / "cc"
    img_dir.mkdir()
    Image.new("RGB", (12, 34)).save(img_dir / "00000000.jpg")
    Image.new("RGB", (10, 10)).save(img_dir / "00000002.jpg")
    (img_dir / "00000003.jpg").write_bytes(b"not a jpeg")  # corrupt
    tsv = tmp_path / "caps.tsv"
    tsv.write_text(
        "a dog on a beach\thttp://x/0.jpg\n"
        "missing image\thttp://x/1.jpg\n"
        "a cat indoors\thttp://x/2.jpg\n"
        "corrupt image\thttp://x/3.jpg\n"
    )
    out = tmp_path / "index" / "index_train.json"
    run(
        "conceptual/extract_conceptual_meta.py",
        "--tsv", str(tsv), "--images", str(img_dir), "--out", str(out),
    )
    items = json.loads(out.read_text())
    assert [it["id"] for it in items] == [0, 2]
    assert items[0]["caption"] == "a dog on a beach"
    assert (items[0]["height"], items[0]["width"]) == (34, 12)

    # sharded extraction + merge reproduces the single-pass index
    # (reference partitions the 3.3M-image corpus into 40 jobs and
    # merges: merge_conceptual_cap_meta.py)
    for k in range(2):
        run(
            "conceptual/extract_conceptual_meta.py",
            "--tsv", str(tsv), "--images", str(img_dir),
            "--out", str(tmp_path / f"shard.{k}.2.json"),
            "--shard", f"{k}/2",
        )
    shard0 = json.loads((tmp_path / "shard.0.2.json").read_text())
    assert [it["id"] for it in shard0] == [0, 2]  # even rows
    assert json.loads((tmp_path / "shard.1.2.json").read_text()) == []
    merged = tmp_path / "merged.json"
    run(
        "conceptual/extract_conceptual_meta.py",
        "--merge", str(tmp_path / "shard.*.2.json"),
        "--out", str(merged),
    )
    assert json.loads(merged.read_text()) == items
