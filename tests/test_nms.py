import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.ops import batched_nms, nms


def np_iou(a, b):
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def np_greedy_nms(boxes, scores, thresh):
    """Sequential greedy NMS with the legacy +1 IoU (reference
    csrc/cpu/nms_cpu.cpp semantics). Returns kept indices, score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    iou = np_iou(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    return np.array(keep, np.int32)


def random_boxes(rng, n, size=200):
    ctr = rng.uniform(20, size - 20, (n, 2))
    wh = rng.uniform(5, 60, (n, 2))
    return np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1).astype(
        np.float32
    )


def test_nms_matches_sequential_greedy():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 300
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        ref = np_greedy_nms(boxes, scores, 0.5)
        idx, keep_valid = nms(
            jnp.asarray(boxes),
            jnp.asarray(scores),
            jnp.ones(n, bool),
            iou_threshold=0.5,
            max_outputs=n,
            tile=64,  # force multiple tiles
        )
        ours = np.asarray(idx)[np.asarray(keep_valid)]
        np.testing.assert_array_equal(ours, ref)


def test_nms_respects_valid_mask():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
    )
    scores = np.array([0.9, 0.95, 0.1], np.float32)
    valid = jnp.array([True, False, True])
    idx, keep = nms(
        jnp.asarray(boxes), jnp.asarray(scores), valid, 0.5, 3
    )
    kept = set(np.asarray(idx)[np.asarray(keep)].tolist())
    # box 1 is invalid: must not be kept nor suppress box 0
    assert kept == {0, 2}


def test_nms_max_outputs_truncates_by_score():
    rng = np.random.RandomState(3)
    boxes = random_boxes(rng, 100, size=10000)  # mostly disjoint
    scores = rng.uniform(0, 1, 100).astype(np.float32)
    ref = np_greedy_nms(boxes, scores, 0.5)[:10]
    idx, keep = nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(100, bool), 0.5, 10
    )
    np.testing.assert_array_equal(np.asarray(idx)[np.asarray(keep)], ref)


def test_batched_nms_separates_classes():
    # identical overlapping boxes, different labels: both survive
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    labels = jnp.array([1, 2])
    idx, keep = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), labels, jnp.ones(2, bool),
        0.5, 2,
    )
    assert int(jnp.sum(keep)) == 2
    # same label: one suppressed
    idx, keep = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.array([1, 1]),
        jnp.ones(2, bool), 0.5, 2,
    )
    assert int(jnp.sum(keep)) == 1


def test_batched_nms_matches_per_class_greedy():
    """Label-aware NMS (same-class mask fused into the suppression
    reduce) must equal the reference's per-class python loop
    (roi_heads/box_head/inference.py:119-144) exactly — including at
    coordinates/class-counts where the old coordinate-offset trick lost
    f32 precision."""
    rng = np.random.RandomState(7)
    n, n_cls = 400, 1203
    x1 = rng.uniform(0, 1300, n).astype(np.float32)
    y1 = rng.uniform(0, 800, n).astype(np.float32)
    w = rng.uniform(0.5, 80, n).astype(np.float32)
    h = rng.uniform(0.5, 80, n).astype(np.float32)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], axis=1)
    scores = rng.rand(n).astype(np.float32)
    labels = rng.randint(0, n_cls, n).astype(np.int32)
    valid = rng.rand(n) > 0.1

    idx, keep = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        jnp.asarray(valid), 0.5, n, tile=64,
    )
    got = sorted(int(i) for i, k in zip(np.asarray(idx), np.asarray(keep)) if k)

    want = []
    for c in np.unique(labels):
        sel = np.where((labels == c) & valid)[0]
        if len(sel) == 0:
            continue
        kept = np_greedy_nms(boxes[sel], scores[sel], 0.5)
        want.extend(sel[kept].tolist())
    assert got == sorted(want)
