"""Differential validation of the pycocotools-free evaluator and RLE
codec (VERDICT r1, next-round item 3).

pycocotools itself is not installable here (zero egress), so the
oracles are:

* **dense-mask ground truth** for the RLE codec — encode/decode
  roundtrips, areas, and IoUs are checked against direct boolean-array
  computation, which is exact by construction;
* **a naive loop transcription of the published COCOeval algorithm**
  (cocodataset/cocoapi cocoeval.py evaluateImg/accumulate/summarize)
  for the matcher/accumulator — structurally independent from the
  vectorized implementation under test, fed randomized scenarios with
  crowds, area-range boundaries, score ties and empty images.
"""

import json

import numpy as np
import pytest

from cvpr22_cross_modal_pseudo_labeling_tpu.data.coco_index import CocoIndex
from cvpr22_cross_modal_pseudo_labeling_tpu.data.evaluation.coco_eval import (
    AREA_RANGES,
    IOU_THRS,
    MAX_DETS,
    REC_THRS,
    CocoStyleEvaluator,
    bbox_iou_xywh,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.utils.rle import (
    decode_rle,
    encode_mask,
    merge_rles,
    rle_area,
    rle_iou,
)


# ---------------------------------------------------------------------------
# RLE codec fuzz vs dense masks
# ---------------------------------------------------------------------------

def _random_masks(rng, n=60):
    masks = []
    for i in range(n):
        h = int(rng.randint(1, 90))
        w = int(rng.randint(1, 90))
        style = i % 5
        if style == 0:
            m = rng.rand(h, w) < rng.uniform(0.05, 0.95)
        elif style == 1:
            m = np.zeros((h, w), bool)
        elif style == 2:
            m = np.ones((h, w), bool)
        elif style == 3:  # single pixel
            m = np.zeros((h, w), bool)
            m[rng.randint(h), rng.randint(w)] = True
        else:  # stripes (long runs, exercises multi-char varint)
            m = np.zeros((h, w), bool)
            m[:, :: max(1, int(rng.randint(1, 5)))] = True
        masks.append(m.astype(np.uint8))
    return masks


def test_rle_roundtrip_fuzz():
    rng = np.random.RandomState(20)
    for m in _random_masks(rng):
        rle = encode_mask(m)
        np.testing.assert_array_equal(decode_rle(rle), m)
        assert rle_area(rle) == int(m.sum())


def test_rle_iou_fuzz_vs_dense():
    rng = np.random.RandomState(21)
    for _ in range(40):
        h, w = int(rng.randint(5, 70)), int(rng.randint(5, 70))
        a = (rng.rand(h, w) < rng.uniform(0.1, 0.9)).astype(np.uint8)
        b = (rng.rand(h, w) < rng.uniform(0.1, 0.9)).astype(np.uint8)
        ra, rb = encode_mask(a), encode_mask(b)
        inter = int((a & b).sum())
        union = int((a | b).sum())
        dense_iou = inter / union if union else 0.0
        np.testing.assert_allclose(rle_iou(ra, rb), dense_iou, atol=1e-12)
        # crowd semantics: intersection / dt area
        crowd_iou = inter / int(a.sum()) if a.sum() else 0.0
        np.testing.assert_allclose(
            rle_iou(ra, rb, is_crowd=True), crowd_iou, atol=1e-12
        )


def test_rle_merge_fuzz_vs_dense():
    rng = np.random.RandomState(22)
    for _ in range(10):
        h, w = int(rng.randint(5, 50)), int(rng.randint(5, 50))
        parts = [
            (rng.rand(h, w) < 0.3).astype(np.uint8) for _ in range(3)
        ]
        merged = merge_rles([encode_mask(p) for p in parts])
        dense = (np.stack(parts).sum(0) > 0).astype(np.uint8)
        np.testing.assert_array_equal(decode_rle(merged), dense)


# ---------------------------------------------------------------------------
# Naive-loop COCOeval oracle
# ---------------------------------------------------------------------------

def _oracle_evaluate_img(dts, gts, iou_fn, iscrowd, arng, max_det):
    """Literal transcription of COCOeval.evaluateImg."""
    T = len(IOU_THRS)
    gt_ig0 = [
        bool(c) or not (arng[0] <= g["area"] <= arng[1])
        for g, c in zip(gts, iscrowd)
    ]
    gtind = sorted(range(len(gts)), key=lambda i: gt_ig0[i])
    gts = [gts[i] for i in gtind]
    iscrowd = [iscrowd[i] for i in gtind]
    gt_ig = [gt_ig0[i] for i in gtind]
    dtind = sorted(range(len(dts)), key=lambda i: -dts[i]["score"])[:max_det]
    dts = [dts[i] for i in dtind]
    ious = iou_fn(dts, gts)

    G, D = len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    dt_ig = np.zeros((T, D))
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            iou = min([t, 1 - 1e-10])
            m = -1
            for gind in range(G):
                if gtm[tind, gind] > 0 and not iscrowd[gind]:
                    continue
                if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig[tind, dind] = gt_ig[m]
            dtm[tind, dind] = 1
            gtm[tind, m] = 1
    a = np.array(
        [d["area"] < arng[0] or d["area"] > arng[1] for d in dts]
    )
    dt_ig = np.logical_or(
        dt_ig, np.logical_and(dtm == 0, np.repeat(a[None], T, axis=0))
    )
    return {
        "dtScores": [d["score"] for d in dts],
        "dtMatches": dtm,
        "dtIgnore": dt_ig,
        "num_gt": int(sum(1 for i in gt_ig if not i)),
    }


def _oracle_metrics(gt_by_img_cat, dt_by_img_cat, img_ids, cat_ids, iou_fn):
    """COCOeval.accumulate + summarize in naive loops."""
    T, R = len(IOU_THRS), len(REC_THRS)
    K, A, M = len(cat_ids), len(AREA_RANGES), len(MAX_DETS)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for ki, cat in enumerate(cat_ids):
        for ai, arng in enumerate(AREA_RANGES.values()):
            for mi, max_det in enumerate(MAX_DETS):
                evals = []
                for img in img_ids:
                    gts = gt_by_img_cat.get((img, cat), [])
                    dts = dt_by_img_cat.get((img, cat), [])
                    if not gts and not dts:
                        continue
                    iscrowd = [bool(g.get("iscrowd", 0)) for g in gts]
                    evals.append(
                        _oracle_evaluate_img(
                            dts, gts,
                            lambda d, g: iou_fn(d, g, img, cat),
                            iscrowd, arng, max_det,
                        )
                    )
                npig = sum(e["num_gt"] for e in evals)
                if npig == 0:
                    continue
                scores = np.concatenate(
                    [e["dtScores"] for e in evals]
                ) if evals else np.zeros(0)
                order = np.argsort(-scores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dtMatches"] for e in evals], axis=1
                )[:, order]
                dt_ig = np.concatenate(
                    [e["dtIgnore"] for e in evals], axis=1
                )[:, order]
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(
                    np.logical_not(dtm), np.logical_not(dt_ig)
                )
                tp_sum = np.cumsum(tps, axis=1).astype(float)
                fp_sum = np.cumsum(fps, axis=1).astype(float)
                for t in range(T):
                    tp, fp = tp_sum[t], fp_sum[t]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros(R)
                    recall[t, ki, ai, mi] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(inds):
                        try:
                            q[ri] = pr[pi]
                        except IndexError:
                            pass
                    precision[t, :, ki, ai, mi] = q

    def ap(iou_thr=None, area="all", max_det=100):
        ai = list(AREA_RANGES).index(area)
        mi = MAX_DETS.index(max_det)
        p = precision[:, :, :, ai, mi]
        if iou_thr is not None:
            ti = int(np.where(np.isclose(IOU_THRS, iou_thr))[0][0])
            p = p[ti : ti + 1]
        v = p[p > -1]
        return float(v.mean()) if v.size else -1.0

    def ar(area="all", max_det=100):
        ai = list(AREA_RANGES).index(area)
        mi = MAX_DETS.index(max_det)
        r = recall[:, :, ai, mi]
        v = r[r > -1]
        return float(v.mean()) if v.size else -1.0

    return {
        "AP": ap(),
        "AP50": ap(iou_thr=0.5),
        "AP75": ap(iou_thr=0.75),
        "APs": ap(area="small"),
        "APm": ap(area="medium"),
        "APl": ap(area="large"),
        "AR@1": ar(max_det=1),
        "AR@10": ar(max_det=10),
        "AR@100": ar(max_det=100),
        "ARs": ar(area="small"),
        "ARm": ar(area="medium"),
        "ARl": ar(area="large"),
    }


# ---------------------------------------------------------------------------
# Randomized bbox scenario
# ---------------------------------------------------------------------------

def _random_scenario(rng, n_imgs=6, n_cats=3, segm=False, hw=(96, 128)):
    h, w = hw
    images, annotations, detections = [], [], []
    aid = 0
    for img in range(1, n_imgs + 1):
        images.append(
            {"id": img, "file_name": f"{img}.jpg", "height": h, "width": w}
        )
        for _ in range(rng.randint(0, 6)):
            aid += 1
            # areas spanning the small/medium/large boundaries
            side = rng.choice([4, 8, 31, 33, 64, 97, 120])
            x = rng.uniform(0, w - side * 0.6)
            y = rng.uniform(0, h - side * 0.6)
            bw = min(side * rng.uniform(0.7, 1.3), w - x - 1)
            bh = min(side * rng.uniform(0.7, 1.3), h - y - 1)
            ann = {
                "id": aid,
                "image_id": img,
                "category_id": int(rng.randint(1, n_cats + 1)),
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "iscrowd": int(rng.rand() < 0.2),
            }
            if segm:
                mask = np.zeros((h, w), np.uint8)
                x0, y0 = int(x), int(y)
                mask[y0 : int(y + bh) + 1, x0 : int(x + bw) + 1] = (
                    rng.rand(int(y + bh) + 1 - y0, int(x + bw) + 1 - x0)
                    < 0.7
                )
                rle = encode_mask(mask)
                ann["segmentation"] = rle
                ann["area"] = float(mask.sum())
            else:
                ann["area"] = float(bw * bh)
            annotations.append(ann)
        # detections: jittered copies of gts + random noise, with ties
        for _ in range(rng.randint(0, 8)):
            base = annotations[rng.randint(len(annotations))] if (
                annotations and rng.rand() < 0.7
            ) else None
            if base is not None and base["image_id"] == img:
                bx, by, bbw, bbh = base["bbox"]
                bbox = [
                    bx + rng.uniform(-6, 6),
                    by + rng.uniform(-6, 6),
                    max(bbw + rng.uniform(-5, 5), 2.0),
                    max(bbh + rng.uniform(-5, 5), 2.0),
                ]
                cat = base["category_id"]
            else:
                side = rng.choice([6, 30, 70, 100])
                bbox = [
                    rng.uniform(0, w - 10), rng.uniform(0, h - 10),
                    side * rng.uniform(0.7, 1.2), side * rng.uniform(0.7, 1.2),
                ]
                cat = int(rng.randint(1, n_cats + 1))
            det = {
                "image_id": img,
                "category_id": cat,
                "bbox": [float(v) for v in bbox],
                # quantized scores -> deliberate ties
                "score": float(np.round(rng.rand(), 1)),
            }
            if segm:
                mask = np.zeros((h, w), np.uint8)
                x0 = int(np.clip(bbox[0], 0, w - 2))
                y0 = int(np.clip(bbox[1], 0, h - 2))
                x1 = int(np.clip(bbox[0] + bbox[2], x0 + 1, w - 1))
                y1 = int(np.clip(bbox[1] + bbox[3], y0 + 1, h - 1))
                mask[y0:y1, x0:x1] = (
                    rng.rand(y1 - y0, x1 - x0) < 0.75
                )
                det["segmentation"] = encode_mask(mask)
            detections.append(det)
    categories = [
        {"id": c, "name": f"c{c}", "split": "seen" if c % 2 else "unseen"}
        for c in range(1, n_cats + 1)
    ]
    return images, annotations, detections, categories


@pytest.mark.parametrize("seed", [30, 31, 32])
@pytest.mark.parametrize("iou_type", ["bbox", "segm"])
def test_evaluator_matches_naive_cocoeval(tmp_path, seed, iou_type):
    rng = np.random.RandomState(seed)
    images, anns, dets, cats = _random_scenario(
        rng, segm=(iou_type == "segm")
    )
    p = tmp_path / f"ann_{seed}_{iou_type}.json"
    p.write_text(json.dumps({
        "images": images, "annotations": anns, "categories": cats,
    }))
    idx = CocoIndex(str(p))

    ev = CocoStyleEvaluator(idx, iou_type)
    ev.update(dets)
    ev.accumulate()
    ours = ev.summarize()

    # oracle bookkeeping
    gt_by, dt_by = {}, {}
    for g in anns:
        gt_by.setdefault((g["image_id"], g["category_id"]), []).append(g)
    for d in dets:
        d = dict(d)
        if iou_type == "segm":
            d["area"] = float(rle_area(d["segmentation"]))
        else:
            d["area"] = d["bbox"][2] * d["bbox"][3]
        dt_by.setdefault((d["image_id"], d["category_id"]), []).append(d)

    if iou_type == "segm":
        def iou_fn(ds, gs, img, cat):
            if not ds or not gs:
                return np.zeros((len(ds), len(gs)))
            out = np.zeros((len(ds), len(gs)))
            for i, d in enumerate(ds):
                for j, g in enumerate(gs):
                    out[i, j] = rle_iou(
                        d["segmentation"], g["segmentation"],
                        is_crowd=bool(g.get("iscrowd", 0)),
                    )
            return out
    else:
        def iou_fn(ds, gs, img, cat):
            if not ds or not gs:
                return np.zeros((len(ds), len(gs)))
            return bbox_iou_xywh(
                np.array([d["bbox"] for d in ds], float),
                np.array([g["bbox"] for g in gs], float),
                [bool(g.get("iscrowd", 0)) for g in gs],
            )

    ref = _oracle_metrics(
        gt_by, dt_by, [im["id"] for im in images],
        [c["id"] for c in cats], iou_fn,
    )
    for k, v in ref.items():
        np.testing.assert_allclose(
            ours[k], v, atol=1e-9, err_msg=f"metric {k}"
        )
