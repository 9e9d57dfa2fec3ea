"""End-to-end parity against the COMPLETE reference model.

This is the integration closure of the module-level oracle suite
(tests/test_reference_parity.py): the reference GeneralizedRCNN —
backbone → RPN (compiled csrc/cpu/nms_cpu.cpp) → RoIAlign (compiled
csrc/cpu/ROIAlign_cpu.cpp) → embedding-based box head → per-class NMS →
mask head — runs on CPU with controlled random weights; its state_dict
is saved as a real .pth, loaded through our torch-checkpoint loader and
suffix-matching importer, and the resulting JAX model must produce the
same detections and mask probability maps on the same image.

Covers VERDICT r1 item 1 end-to-end: the full pipeline integration AND
`import_torch_state_dict` against the reference's real key names
(reference modeling/detector/generalized_rcnn.py:16-73,
utils/model_serialization.py:10-67).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_oracle import install_reference_full
from test_reference_parity import _randomize_state_dict

pytestmark = pytest.mark.slow

NUM_CLASSES = 9  # incl. background row 0
EMB_DIM = 32
IMG_H, IMG_W = 96, 128
PRE_NMS = 400
POST_NMS = 64
DETS_PER_IMG = 16


def _ref_cfg():
    from maskrcnn_benchmark.config import cfg

    c = cfg.clone()
    c.MODEL.DEVICE = "cpu"
    c.MODEL.MASK_ON = True
    c.MODEL.CLS_AGNOSTIC_MASK = True
    c.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    c.MODEL.ROI_BOX_HEAD.NUM_CLASSES = NUM_CLASSES
    c.MODEL.ROI_BOX_HEAD.EMB_DIM = EMB_DIM
    c.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    c.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    c.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = DETS_PER_IMG
    c.MODEL.RPN.PRE_NMS_TOP_N_TEST = PRE_NMS
    c.MODEL.RPN.POST_NMS_TOP_N_TEST = POST_NMS
    return c


def _our_cfg():
    from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.CLS_AGNOSTIC_MASK = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = NUM_CLASSES
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = EMB_DIM
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = DETS_PER_IMG
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = PRE_NMS
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = POST_NMS
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.NMS_TILE = 128
    return cfg


def _tame_state_dict(sd, orig):
    """Scales the randomized weights so the oracle is *healthy*: O(1)
    activations through the residual stack, small box deltas (else every
    proposal decodes off-image and clips to degenerate slivers), and
    unsaturated class scores.  Anchor buffers keep their real values —
    they are geometry, not weights."""
    import re

    for k in sd:
        if "anchor_generator" in k:
            sd[k] = orig[k]
        if re.search(r"layer\d\.\d+\.conv3\.weight$", k):
            sd[k] = sd[k] * 0.1
        if re.search(r"rpn\.head\.bbox_pred\.(weight|bias)$", k):
            sd[k] = sd[k] * 0.05
        if re.search(r"predictor\.bbox_pred\.(weight|bias)$", k):
            sd[k] = sd[k] * 0.05
        if re.search(r"predictor\.emb_pred\.(weight|bias)$", k):
            sd[k] = sd[k] * 0.15
    return sd


@pytest.fixture(scope="module")
def e2e(tmp_path_factory):
    build = install_reference_full()
    from maskrcnn_benchmark.structures.image_list import to_image_list

    ref_model = build(_ref_cfg())
    rng = np.random.RandomState(7)
    orig = ref_model.state_dict()
    ref_model.load_state_dict(
        _tame_state_dict(_randomize_state_dict(orig, rng), orig)
    )
    ref_model.eval()

    class_emb = (0.3 * rng.randn(NUM_CLASSES, EMB_DIM)).astype(np.float32)
    image = rng.randn(3, IMG_H, IMG_W).astype(np.float32)

    ref_model.roi_heads.box.predictor.set_class_embeddings(
        torch.from_numpy(class_emb)
    )
    with torch.no_grad():
        feats = ref_model.backbone(torch.from_numpy(image)[None])
        (ref_proposals,), _ = ref_model.rpn(
            to_image_list([torch.from_numpy(image)], 32), feats, None
        )
        (ref_dets,) = ref_model(to_image_list([torch.from_numpy(image)], 32))

    pth = tmp_path_factory.mktemp("ckpt") / "ref_model.pth"
    torch.save(ref_model.state_dict(), str(pth))

    return {
        "pth": str(pth),
        "class_emb": class_emb,
        "image": image,
        "ref_c4": feats[0].numpy(),
        "ref_proposals": ref_proposals.bbox.numpy(),
        "ref_boxes": ref_dets.bbox.numpy(),
        "ref_scores": ref_dets.get_field("scores").numpy(),
        "ref_labels": ref_dets.get_field("labels").numpy(),
        "ref_masks": ref_dets.get_field("mask").numpy(),  # [N,1,14,14]
    }


@pytest.fixture(scope="module")
def ours(e2e):
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        import_torch_state_dict,
        load_torch_checkpoint,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
        GeneralizedRCNN,
        statics_from_cfg,
    )

    model = GeneralizedRCNN(statics_from_cfg(_our_cfg()))
    images = jnp.asarray(e2e["image"].transpose(1, 2, 0))[None]
    image_sizes = jnp.array([[IMG_H, IMG_W]], jnp.int32)
    class_emb = jnp.asarray(e2e["class_emb"])
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        images,
        image_sizes,
        class_emb,
        train=False,
    )

    sd = load_torch_checkpoint(e2e["pth"])
    new_params, report = import_torch_state_dict(params["params"], sd)

    out = model.apply(
        {"params": new_params}, images, image_sizes, class_emb, train=False
    )
    return {"report": report, "out": out, "sd": sd}


def test_import_covers_every_parameter(ours):
    """Every leaf of our model is filled from the reference .pth, and the
    only reference keys without a target are the anchor buffers (we
    enumerate anchors statically) — i.e. the importer handles the real
    key vocabulary, not just synthetic tests."""
    rep = ours["report"]
    assert not rep["unfilled_targets"], rep["unfilled_targets"][:8]
    sd = ours["sd"]
    for k in rep["missed_source_keys"]:
        if "anchor_generator" in k:
            continue  # anchors are enumerated statically on our side
        # SHARE_BOX_FEATURE_EXTRACTOR aliases the box extractor into the
        # mask head (reference roi_heads.py:20-21), so its state_dict
        # carries each shared tensor twice; the duplicate copy is the
        # only other acceptable unmatched source.
        assert k.startswith("roi_heads.mask.feature_extractor."), (
            f"unexpected unmatched source: {k}"
        )
        twin = k.replace("roi_heads.mask.", "roi_heads.box.")
        np.testing.assert_array_equal(sd[k], sd[twin])


def _greedy_match(ref_boxes, ref_labels, our_boxes, our_labels, iou_thresh):
    """Per-label greedy IoU matching; returns list of (ref_i, our_j)."""

    def iou(a, b):
        lt = np.maximum(a[:, None, :2], b[None, :, :2])
        rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(rb - lt + 1, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        ar_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
        ar_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
        return inter / (ar_a[:, None] + ar_b[None] - inter)

    m = iou(ref_boxes, our_boxes)
    m[ref_labels[:, None] != our_labels[None, :]] = -1
    pairs = []
    used_r, used_o = set(), set()
    order = np.dstack(np.unravel_index(np.argsort(-m, axis=None), m.shape))[0]
    for r, o in order:
        if m[r, o] < iou_thresh:
            break
        if r in used_r or o in used_o:
            continue
        pairs.append((int(r), int(o)))
        used_r.add(r)
        used_o.add(o)
    return pairs


def test_detection_parity(e2e, ours):
    """Final detections of the two full pipelines agree: ≥90% of boxes
    match 1:1 at IoU>0.9 with the same label and near-identical score."""
    out = ours["out"]
    valid = np.asarray(out.detections.valid[0])
    boxes = np.asarray(out.detections.boxes[0])[valid]
    scores = np.asarray(out.detections.scores[0])[valid]
    labels = np.asarray(out.detections.labels[0])[valid]

    rb, rs, rl = e2e["ref_boxes"], e2e["ref_scores"], e2e["ref_labels"]
    assert len(rb) > 3, "degenerate oracle: reference returned <4 detections"

    pairs = _greedy_match(rb, rl, boxes, labels, iou_thresh=0.9)
    frac_ref = len(pairs) / len(rb)
    frac_ours = len(pairs) / max(len(boxes), 1)
    assert frac_ref >= 0.9, (
        f"only {len(pairs)}/{len(rb)} reference detections matched; "
        f"ref scores {rs[:5]} ours {scores[:5]}"
    )
    assert frac_ours >= 0.9, f"{len(boxes) - len(pairs)} spurious detections"

    score_diffs = [abs(rs[r] - scores[o]) for r, o in pairs]
    assert max(score_diffs) < 2e-3, f"max score diff {max(score_diffs)}"
    box_err = max(
        np.abs(rb[r] - boxes[o]).max() for r, o in pairs
    )
    assert box_err < 0.1, f"max matched box coordinate diff {box_err}px"


def test_mask_parity(e2e, ours):
    """Mask probability maps agree on matched detections (reference
    returns raw 14x14 sigmoid maps, POSTPROCESS_MASKS=False default)."""
    out = ours["out"]
    valid = np.asarray(out.detections.valid[0])
    boxes = np.asarray(out.detections.boxes[0])[valid]
    labels = np.asarray(out.detections.labels[0])[valid]
    masks = np.asarray(out.mask_probs[0])[valid]

    rb, rl = e2e["ref_boxes"], e2e["ref_labels"]
    rm = e2e["ref_masks"][:, 0]  # [N,14,14]

    pairs = _greedy_match(rb, rl, boxes, labels, iou_thresh=0.9)
    assert pairs, "no matched detections to compare masks on"
    diffs = [np.abs(rm[r] - masks[o]).max() for r, o in pairs]
    assert np.median(diffs) < 5e-3, f"median mask prob diff {np.median(diffs)}"
    assert max(diffs) < 5e-2, f"max mask prob diff {max(diffs)}"


# ---------------------------------------------------------------------------
# Training-loss parity: same weights + same GT -> same loss dict.
# Sampling caps are set above every candidate count (RPN batch >= all
# anchors, RoI batch >= proposals+GT, POSITIVE_FRACTION high enough to
# keep every positive) so both frameworks keep the SAME sample set and
# the reference's randperm only permutes order, which every loss
# reduction is invariant to.
# ---------------------------------------------------------------------------

N_GT = 3


def _train_cfg_overrides(c, is_ref):
    c.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = PRE_NMS
    c.MODEL.RPN.POST_NMS_TOP_N_TRAIN = POST_NMS
    # our padded sampler compacts to a static batch <= candidate count,
    # so pin both batches to the exact pool sizes; the reference then
    # also keeps everything (min(batch, available) semantics)
    c.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 720  # all anchors at 96x128
    c.MODEL.RPN.POSITIVE_FRACTION = 0.5
    c.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = POST_NMS + N_GT
    c.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    return c


def _gt_fixture(rng):
    """Rectangle-mask GT: piecewise-constant masks minimize resampling
    differences between the reference's polygon/mask projection and our
    box-local 28x28 representation."""
    boxes = np.array(
        [[10.0, 8.0, 60.0, 50.0], [50.0, 30.0, 120.0, 90.0],
         [4.0, 60.0, 40.0, 92.0]],
        np.float32,
    )
    labels = np.array([1, 2, 4], np.int64)
    masks = np.zeros((N_GT, IMG_H, IMG_W), np.uint8)
    for i, (x1, y1, x2, y2) in enumerate(boxes):
        # inset rectangle so the mask has structure inside the box
        ix1, iy1 = int(x1) + 3, int(y1) + 2
        ix2, iy2 = int(x2) - 4, int(y2) - 3
        masks[i, iy1:iy2, ix1:ix2] = 1
    return boxes, labels, masks


@pytest.fixture(scope="module")
def train_pair(e2e):
    """Reference train-mode loss dict on a fixed GT set."""
    from maskrcnn_benchmark.structures.bounding_box import BoxList
    from maskrcnn_benchmark.structures.image_list import to_image_list
    from maskrcnn_benchmark.structures.segmentation_mask import (
        SegmentationMask,
    )

    build = install_reference_full()
    ref_model = build(_train_cfg_overrides(_ref_cfg(), True))
    rng = np.random.RandomState(7)
    orig = ref_model.state_dict()
    ref_model.load_state_dict(
        _tame_state_dict(_randomize_state_dict(orig, rng), orig)
    )
    ref_model.train()
    ref_model.roi_heads.box.predictor.set_class_embeddings(
        torch.from_numpy(e2e["class_emb"])
    )

    gb, gl, gm = _gt_fixture(rng)
    target = BoxList(torch.from_numpy(gb), (IMG_W, IMG_H))
    target.add_field("labels", torch.from_numpy(gl))
    target.add_field(
        "masks",
        SegmentationMask(torch.from_numpy(gm), (IMG_W, IMG_H), mode="mask"),
    )
    timg = torch.from_numpy(e2e["image"])
    losses = ref_model(to_image_list([timg], 32), [target])
    return {k: float(v.detach()) for k, v in losses.items()}


def test_training_loss_parity(e2e, train_pair):
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        import_torch_state_dict,
        load_torch_checkpoint,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.datasets.coco import (
        rasterize_instance_mask,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
        GeneralizedRCNN,
        statics_from_cfg,
    )

    cfg = _train_cfg_overrides(_our_cfg(), False)
    model = GeneralizedRCNN(statics_from_cfg(cfg))
    images = jnp.asarray(e2e["image"].transpose(1, 2, 0))[None]
    image_sizes = jnp.array([[IMG_H, IMG_W]], jnp.int32)
    class_emb = jnp.asarray(e2e["class_emb"])

    rng = np.random.RandomState(7)
    gb, gl, gm = _gt_fixture(rng)
    polys = []
    for x1, y1, x2, y2 in gb:
        ix1, iy1 = int(x1) + 3, int(y1) + 2
        ix2, iy2 = int(x2) - 4, int(y2) - 3
        polys.append([[ix1, iy1, ix2, iy1, ix2, iy2, ix1, iy2]])
    local = np.stack(
        [
            rasterize_instance_mask(polys[i], gb[i], (IMG_H, IMG_W), 28)
            for i in range(N_GT)
        ]
    )
    targets = {
        "gt_boxes": jnp.asarray(gb)[None],
        "gt_labels": jnp.asarray(gl.astype(np.int32))[None],
        "gt_valid": jnp.ones((1, N_GT), bool),
        "gt_masks": jnp.asarray(local.astype(np.float32))[None],
    }

    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        images,
        image_sizes,
        class_emb,
        targets,
        train=True,
    )
    sd = load_torch_checkpoint(e2e["pth"])
    new_params, _ = import_torch_state_dict(params["params"], sd)
    out = model.apply(
        {"params": new_params},
        images,
        image_sizes,
        class_emb,
        targets,
        train=True,
        rngs={"sampler": jax.random.PRNGKey(2)},
    )

    ref = train_pair
    ours = {k: float(v) for k, v in out.losses.items()}
    assert set(ours) == set(ref), set(ours) ^ set(ref)
    for k in ref:
        # loss_mask: the GT-mask representations differ by design (our
        # box-local 28x28 crops vs the reference's per-proposal CPU
        # projection of the full-image mask, mask_head/loss.py:11-42);
        # boundary half-pixel disagreement under saturated random-init
        # logits moves BCE by a few percent.  The per-pixel agreement of
        # the two projections is pinned separately by
        # test_reference_parity.py::test_mask_target_projection_agreement.
        tol = 0.15 if k == "loss_mask" else 2e-3
        assert abs(ours[k] - ref[k]) <= tol * max(1.0, abs(ref[k])), (
            f"{k}: ours {ours[k]:.6f} vs reference {ref[k]:.6f}"
        )
