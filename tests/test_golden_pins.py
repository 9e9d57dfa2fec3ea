"""Golden AP + detection pins on a deterministic fixture.

VERDICT r3 item 6: the inference tests asserted finiteness and
host/device consistency but no exact values, so a postprocessor or
evaluator drift could pass silently.  This module pins, for a frozen
(seed-0) checkpoint over a byte-deterministic fixture:

  * every scalar COCO metric (bbox + segm, incl. per-split AP50) to 6
    decimals, and
  * the top-3 detection boxes/scores/labels of image 0,

against ``tests/fixtures/golden_pins.json``.

Regeneration (documented path — run after an INTENTIONAL behavior
change, then review the diff of the json like any other code change):

    JAX_PLATFORMS=cpu python tests/test_golden_pins.py --regen

The pinned model is ``model.init(PRNGKey(0))`` — deterministic for a
fixed jax version — so no binary checkpoint needs to be committed; a
jax upgrade that changes initializer streams shows up as a loud failure
with an auditable regen diff, exactly like the reference's
TEST.EXPECTED_RESULTS regression hook (coco_eval.py:417-436,
defaults.py:534) but with exact pins instead of sigma windows.
"""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.data.collate import BatchCollator
from cvpr22_cross_modal_pseudo_labeling_tpu.data.datasets.coco import (
    COCODataset,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.data.transforms import (
    build_transforms,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.inference import inference

PINS = os.path.join(REPO, "tests", "fixtures", "golden_pins.json")


def build_fixture(root):
    """4 images, 2 categories (seen/unseen), boxes + polygon masks —
    all geometry arithmetic-deterministic, image bytes PRNG(7)."""
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(7)
    images, annotations = [], []
    aid = 1
    for i in range(4):
        h, w = 60, 80
        Image.fromarray(
            (rng.rand(h, w, 3) * 255).astype(np.uint8)
        ).save(os.path.join(img_dir, f"img{i}.jpg"))
        images.append(
            {"id": i + 1, "file_name": f"img{i}.jpg",
             "height": h, "width": w}
        )
        for cat, (x0, y0, bw, bh) in (
            (1, (8 + 2 * i, 6, 28, 22)),
            (2, (44, 24 + 3 * i, 24, 20)),
        ):
            annotations.append(
                {
                    "id": aid,
                    "image_id": i + 1,
                    "category_id": cat,
                    "bbox": [x0, y0, bw, bh],
                    "area": bw * bh,
                    "iscrowd": 0,
                    "segmentation": [[
                        x0, y0, x0 + bw - 1, y0,
                        x0 + bw - 1, y0 + bh - 1, x0, y0 + bh - 1,
                    ]],
                }
            )
            aid += 1
    emb = np.random.RandomState(11).randn(2, 16).round(4)
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 1, "name": "cat", "split": "seen",
             "embedding": {"BertEmb": emb[0].tolist()}},
            {"id": 2, "name": "dog", "split": "unseen",
             "embedding": {"BertEmb": emb[1].tolist()}},
        ],
    }
    ann_file = os.path.join(root, "ann.json")
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return ann_file, img_dir


class ListLoader:
    def __init__(self, dataset, collator, batch_size=2):
        self.items = [
            ([dataset[i]
              for i in range(j, min(j + batch_size, len(dataset)))],
             list(range(j, min(j + batch_size, len(dataset)))))
            for j in range(0, len(dataset), batch_size)
        ]
        self.collator = collator

    def __iter__(self):
        for samples, idxs in self.items:
            yield self.collator(samples), idxs


def compute_golden(root):
    import jax
    import jax.numpy as jnp

    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
        GeneralizedRCNN,
        statics_from_cfg,
    )

    ann_file, img_dir = build_fixture(root)
    cfg = get_default_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 64
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.CLS_AGNOSTIC_MASK = True
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 16
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = 8
    cfg.MODEL.ROI_HEADS.SCORE_THRESH = 0.0
    cfg.TPU.NMS_TILE = 64

    tf = build_transforms(cfg, is_train=False)
    ds = COCODataset(
        ann_file, img_dir, False, transforms=tf,
        extra_args={"LOAD_EMBEDDINGS": True, "EMB_KEY": "BertEmb",
                    "EMB_DIM": 16},
    )
    collator = BatchCollator(
        buckets=((64, 64),), max_gt=4, max_cap_tokens=8, max_cap_nouns=2
    )
    loader = ListLoader(ds, collator)
    model = GeneralizedRCNN(statics_from_cfg(cfg))
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)),
        jnp.array([[48, 64]], jnp.int32),
        jnp.asarray(ds.class_emb_mtx),
        train=False,
    )

    results_sink = os.path.join(root, "predictions.json")
    metrics = inference(
        model, params, loader, ds, iou_types=("bbox", "segm"),
        output_file=results_sink,
    )
    with open(results_sink) as f:
        preds = json.load(f)
    img0 = [p for p in preds if p["image_id"] == 1][:3]
    return {
        "metrics": {
            k: round(float(v), 6)
            for k, v in sorted(metrics.items())
            if isinstance(v, (int, float)) and k != "total_eval_seconds"
        },
        "img0_top3": [
            {
                "bbox": [round(float(x), 3) for x in p["bbox"]],
                "score": round(float(p["score"]), 5),
                "category_id": p["category_id"],
            }
            for p in img0
        ],
    }


def compute_engine_golden(root):
    """Non-vacuous engine pins: a stub model emits deterministic graded
    detections (exact GT, an IoU~0.5 shift, a far miss) through the
    REAL ``inference()`` engine — conversion, Masker paste, RLE,
    accumulate, COCOeval, per-split AP50 — so the pinned APs are
    strictly inside (0, 1) and any conversion/evaluator drift moves
    them."""
    import jax.numpy as jnp

    from cvpr22_cross_modal_pseudo_labeling_tpu.models.roi_heads.box_head import (
        Detections,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.generalized_rcnn import (
        RCNNEvalOutput,
    )

    ann_file, img_dir = build_fixture(root)
    cfg = get_default_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 64

    tf = build_transforms(cfg, is_train=False)
    ds = COCODataset(
        ann_file, img_dir, False, transforms=tf,
        extra_args={"LOAD_EMBEDDINGS": True, "EMB_KEY": "BertEmb",
                    "EMB_DIM": 16},
    )
    collator = BatchCollator(
        buckets=((64, 64),), max_gt=4, max_cap_tokens=8, max_cap_nouns=2
    )
    loader = ListLoader(ds, collator)

    class StubModel:
        """Emits, per image: its cat-1 GT box (score .9), its cat-2 GT
        box shifted right by 25% of its width (score .8, IoU 0.6),
        and a far corner box (score .7, FP).  Model frame = original
        * 0.8 (48x64 resize of 60x80).  Full-box masks make segm track
        bbox."""

        def apply(self, params, images, image_sizes,
                  class_embeddings=None, train=False, **kw):
            del params, class_embeddings, train, kw
            b = images.shape[0]
            # per-call batch start index from a counter on the loader
            # order is not available; recompute from image_sizes alone
            # is impossible, so carry a cursor
            i0 = self._cursor
            self._cursor += b
            boxes, scores, labels = [], [], []
            for k in range(b):
                i = i0 + k
                s = 0.8  # resize scale 60x80 -> 48x64
                x0, y0, bw, bh = 8 + 2 * i, 6, 28, 22
                g1 = [s * x0, s * y0, s * (x0 + bw), s * (y0 + bh)]
                x0, y0, bw, bh = 44, 24 + 3 * i, 24, 20
                shift = 0.25 * bw
                g2 = [s * (x0 + shift), s * y0,
                      s * (x0 + bw + shift), s * (y0 + bh)]
                far = [0.0, 0.0, 6.0, 6.0]
                boxes.append([g1, g2, far])
                scores.append([0.9, 0.8, 0.7])
                labels.append([1, 2, 1])
            dets = Detections(
                boxes=jnp.asarray(boxes, jnp.float32),
                scores=jnp.asarray(scores, jnp.float32),
                labels=jnp.asarray(labels, jnp.int32),
                valid=jnp.ones((b, 3), bool),
            )
            mask_probs = jnp.ones((b, 3, 28, 28), jnp.float32)
            return RCNNEvalOutput(dets, mask_probs)

        _cursor = 0

    metrics = inference(
        StubModel(), {}, loader, ds, iou_types=("bbox", "segm")
    )
    return {
        k: round(float(v), 6)
        for k, v in sorted(metrics.items())
        if isinstance(v, (int, float)) and k != "total_eval_seconds"
    }


@pytest.mark.slow
def test_engine_golden_pins(tmp_path):
    if not os.path.exists(PINS):
        pytest.skip("golden_pins.json not minted; run --regen")
    with open(PINS) as f:
        pinned = json.load(f)
    actual = compute_engine_golden(str(tmp_path))
    mismatches = {
        k: (pinned["engine_metrics"].get(k), v)
        for k, v in actual.items()
        if pinned["engine_metrics"].get(k) != v
    }
    assert not mismatches, (
        "engine golden drift (pinned vs actual): "
        f"{mismatches}\nIf intentional: "
        "JAX_PLATFORMS=cpu python tests/test_golden_pins.py --regen"
    )
    # non-vacuous guard: the fixture is designed to land strictly
    # inside (0, 1) on the graded metrics (exact-GT cat detections pin
    # the seen split at exactly 1.0)
    for key in ("bbox/AP", "segm/AP", "bbox/AP50_split_unseen",
                "segm/AP50_split_unseen"):
        assert 0.0 < actual[key] < 1.0, (key, actual[key])
    assert actual["bbox/AP50_split_seen"] == 1.0


@pytest.mark.slow
def test_golden_pins(tmp_path):
    if not os.path.exists(PINS):
        pytest.skip("golden_pins.json not minted; run --regen")
    with open(PINS) as f:
        pinned = json.load(f)
    actual = compute_golden(str(tmp_path))

    mismatches = {
        k: (pinned["metrics"].get(k), v)
        for k, v in actual["metrics"].items()
        if pinned["metrics"].get(k) != v
    }
    assert not mismatches, (
        "golden metric drift (pinned vs actual): "
        f"{mismatches}\nIf intentional: "
        "JAX_PLATFORMS=cpu python tests/test_golden_pins.py --regen"
    )
    assert len(actual["img0_top3"]) == len(pinned["img0_top3"])
    for a, p in zip(actual["img0_top3"], pinned["img0_top3"]):
        assert a["category_id"] == p["category_id"]
        np.testing.assert_allclose(a["bbox"], p["bbox"], atol=1e-2)
        assert abs(a["score"] - p["score"]) < 1e-4


if __name__ == "__main__":
    if "--regen" not in sys.argv:
        print(__doc__)
        sys.exit(2)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        golden = compute_golden(td)
    with tempfile.TemporaryDirectory() as td:
        golden["engine_metrics"] = compute_engine_golden(td)
    os.makedirs(os.path.dirname(PINS), exist_ok=True)
    with open(PINS, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"wrote {PINS}")
    print(json.dumps(golden["engine_metrics"], indent=1))
