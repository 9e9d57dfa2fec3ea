"""End-to-end parity of the PAPER'S CORE PATH against the reference
STGeneralizedRCNN: teacher pseudo-label generation (reference
st_generalized_rcnn.py:218-275) and the student eval path (:409-418),
run on CPU with the reference's own compiled kernels, compared against
our fused device-side implementation loaded from the same .pth.

BERT is patched to a tiny randomly-initialized model with a shared
deterministic tokenizer (no pretrained weights exist in this
environment); since the reference reduces BERT to an embedding-table
lookup (transformers.py:67), parity of extract_emb is exact once both
sides read the same table, which the .pth import provides.
"""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_oracle import install_reference_full
from test_reference_parity import _randomize_state_dict
from test_e2e_reference_parity import _greedy_match, _tame_state_dict

pytestmark = pytest.mark.slow

NUM_CLASSES = 9
# 768 is load-bearing: generate_pseudo_label's vocab save/restore swaps
# in a torch.zeros((1, 768)) dummy (st_generalized_rcnn.py:220), so the
# reference only runs at the production embedding width.
EMB_DIM = 768
IMG_H, IMG_W = 96, 128
PRE_NMS = 400
POST_NMS = 64
DETS_PER_IMG = 16

VOCAB = {
    "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
    "cat": 4, "dog": 5, "zebra": 6, "chair": 7, "person": 8, "a": 9,
}
CAP_WORDS = ["cat", "zebra", "chair"]  # noun phrases for the test image
CAP_IDS = [3, 7, 11]  # 0-based LVIS-style category ids for those nouns


class FakeTokenizer:
    """Deterministic whole-word tokenizer with the HF batch_encode_plus
    surface the reference BERT.forward touches (transformers.py:29-33).
    Unknown words -> [UNK]; special_tokens_mask covers CLS/SEP/PAD like
    HF's."""

    def batch_encode_plus(self, text_list, **kw):
        seqs = [
            [VOCAB["[CLS]"]]
            + [VOCAB.get(w, VOCAB["[UNK]"]) for w in t.split()]
            + [VOCAB["[SEP]"]]
            for t in text_list
        ]
        n = max(len(s) for s in seqs)
        out = {"input_ids": [], "attention_mask": [], "special_tokens_mask": []}
        for s in seqs:
            pad = n - len(s)
            out["input_ids"].append(s + [VOCAB["[PAD]"]] * pad)
            out["attention_mask"].append([1] * len(s) + [0] * pad)
            out["special_tokens_mask"].append(
                [1] + [0] * (len(s) - 2) + [1] + [1] * pad
            )
        return out


def tokenize_words(words):
    """Our-side arrays for the same words: [W, T] ids + real-wordpiece
    mask (1 - special_tokens_mask, like extract_emb)."""
    enc = FakeTokenizer().batch_encode_plus(words)
    ids = np.asarray(enc["input_ids"], np.int32)
    mask = 1 - np.asarray(enc["special_tokens_mask"], np.int32)
    return ids, mask


def _patch_reference_bert():
    import transformers as hf
    import maskrcnn_benchmark.modeling.language_backbone.transformers as rt

    bert_cfg = hf.BertConfig(
        vocab_size=len(VOCAB),
        hidden_size=EMB_DIM,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=64,
    )
    rt.BertConfig = types.SimpleNamespace(
        from_pretrained=lambda name: bert_cfg
    )
    rt.BertTokenizer = types.SimpleNamespace(
        from_pretrained=lambda name: FakeTokenizer()
    )

    def _model(name, config=None):
        torch.manual_seed(3)
        return hf.BertModel(config)

    rt.BertModel = types.SimpleNamespace(from_pretrained=_model)


def _ref_cfg():
    from maskrcnn_benchmark.config import cfg

    c = cfg.clone()
    c.MODEL.DEVICE = "cpu"
    c.MODEL.META_ARCHITECTURE = "STGeneralizedRCNN"
    c.MODEL.MASK_ON = True
    c.MODEL.CLS_AGNOSTIC_MASK = True
    c.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    c.MODEL.UNCERTAINTY = False
    c.MODEL.RPN.DONT_TRAIN = True
    c.MODEL.WEIGHT = "/tmp/st_parity_nonexistent/model.pth"
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
    cfg.MODEL.META_ARCHITECTURE = "STGeneralizedRCNN"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.CLS_AGNOSTIC_MASK = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.UNCERTAINTY = False
    cfg.MODEL.RPN.DONT_TRAIN = True
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = NUM_CLASSES
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = EMB_DIM
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = DETS_PER_IMG
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = PRE_NMS
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = POST_NMS
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = PRE_NMS
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = POST_NMS
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.NMS_TILE = 128
    return cfg


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    build = install_reference_full()
    _patch_reference_bert()
    from maskrcnn_benchmark.structures.bounding_box import BoxList
    from maskrcnn_benchmark.structures.image_list import to_image_list

    model = build(_ref_cfg())
    rng = np.random.RandomState(11)
    orig = model.state_dict()
    model.load_state_dict(
        _tame_state_dict(_randomize_state_dict(orig, rng), orig)
    )
    model.eval()

    class_emb = (0.3 * rng.randn(NUM_CLASSES, EMB_DIM)).astype(np.float32)
    image = rng.randn(3, IMG_H, IMG_W).astype(np.float32)
    timg = torch.from_numpy(image)

    model.roi_heads.box.predictor.set_class_embeddings(
        torch.from_numpy(class_emb)
    )

    # --- teacher pseudo-label branch (generate_pseudo_label) ----------
    with torch.no_grad():
        feats = model.backbone(timg[None])
        (props,), _ = model.rpn(to_image_list([timg], 32), feats, None)
        target = BoxList(torch.zeros((len(CAP_WORDS), 4)), (IMG_W, IMG_H))
        target.add_field("ids_cap", torch.tensor(CAP_IDS))
        (pl,) = model.generate_pseudo_label(
            feats, [props], [CAP_WORDS], [target]
        )
        # restore the vocab clobbered by generate_pseudo_label's
        # save/restore (it restores, but be explicit for the eval pass)
        model.roi_heads.box.predictor.set_class_embeddings(
            torch.from_numpy(class_emb)
        )
        (ev,) = model(to_image_list([timg], 32))

    pth = tmp_path_factory.mktemp("ckpt") / "ref_st.pth"
    torch.save(model.state_dict(), str(pth))

    return {
        "pth": str(pth),
        "class_emb": class_emb,
        "image": image,
        "proposals": props.bbox.numpy(),
        "pl_boxes": pl.bbox.numpy(),
        "pl_scores": pl.get_field("scores").numpy(),
        "pl_labels": pl.get_field("labels").numpy(),
        "pl_masks": pl.get_field("masks").get_mask_tensor().numpy(),
        "ev_boxes": ev.bbox.numpy(),
        "ev_scores": ev.get_field("scores").numpy(),
        "ev_labels": ev.get_field("labels").numpy(),
        "ev_masks": ev.get_field("mask").numpy(),
    }


@pytest.fixture(scope="module")
def ours(ref):
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        import_torch_state_dict,
        load_torch_checkpoint,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.st_generalized_rcnn import (
        STGeneralizedRCNN,
        st_statics_from_cfg,
    )

    statics = st_statics_from_cfg(_our_cfg())._replace(
        vocab_size=len(VOCAB), lvis_vocab=16
    )
    model = STGeneralizedRCNN(statics)
    images = jnp.asarray(ref["image"].transpose(1, 2, 0))[None]
    image_sizes = jnp.array([[IMG_H, IMG_W]], jnp.int32)
    class_emb = jnp.asarray(ref["class_emb"])

    # init through the training path so every bundle (teacher, student,
    # bert, rpn) exists in the param tree
    nw = len(CAP_WORDS)
    dummy_batch = {
        "cap_mask": jnp.array([True]),
        "det_mask": jnp.array([True]),
        "cap_tok_ids": jnp.zeros((1, nw, 4), jnp.int32),
        "cap_tok_mask": jnp.ones((1, nw, 4), jnp.int32),
        "cap_word_valid": jnp.ones((1, nw), bool),
        "cap_labels": jnp.zeros((1, nw), jnp.int32),
        "gt_boxes": jnp.tile(jnp.array([[4.0, 4.0, 30.0, 30.0]]), (1, 4, 1)),
        "gt_labels": jnp.ones((1, 4), jnp.int32),
        "gt_valid": jnp.ones((1, 4), bool),
        "gt_masks": jnp.ones((1, 4, 28, 28)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        images,
        image_sizes,
        dummy_batch,
        class_embeddings=class_emb,
        lvis_class_embeddings=jnp.zeros((16, EMB_DIM)),
        train=True,
    )
    sd = load_torch_checkpoint(ref["pth"])
    new_params, report = import_torch_state_dict(params["params"], sd)

    ids, mask = tokenize_words(CAP_WORDS)

    def _pseudo(m, images, image_sizes, ids, mask, wvalid):
        feats = m.backbone(images)
        _, _, _, props = m._rpn_proposals(
            images, image_sizes, feats, train_selector=False
        )
        return props, m.generate_pseudo_labels(
            feats, props, image_sizes, ids, mask, wvalid
        )

    props, pseudo = model.apply(
        {"params": new_params},
        images,
        image_sizes,
        jnp.asarray(ids)[None],
        jnp.asarray(mask)[None],
        jnp.ones((1, len(CAP_WORDS)), bool),
        method=_pseudo,
    )

    ev = model.apply(
        {"params": new_params},
        images,
        image_sizes,
        class_embeddings=class_emb,
        train=False,
    )
    return {
        "report": report,
        "proposals": props,
        "pseudo": pseudo,
        "ev": ev,
        "sd": sd,
    }


def test_st_import_routes_both_bundles(ours):
    """roi_heads.* -> teacher/*, roi_heads_student.* -> student/*, and
    bert.embeddings -> the word-embedding table; nothing in our tree is
    left at init."""
    rep = ours["report"]
    assert not rep["unfilled_targets"], rep["unfilled_targets"][:8]
    allowed = (
        "anchor_generator",          # static anchors on our side
        "bert.bert_model.",          # unused 1-layer HF stand-in; the live
                                     # path reads only bert.embeddings
        ".mask.feature_extractor.",  # shared-extractor duplicate keys
    )
    for k in rep["missed_source_keys"]:
        assert any(a in k for a in allowed), f"unexpected unmatched: {k}"


def test_pseudo_label_parity(ref, ours):
    """Per caption word: the teacher picks the same region (same
    teacher-regressed box), the same sigmoid alignment score, and the
    same label (ids_cap passthrough)."""
    pseudo = ours["pseudo"]
    our_boxes = np.asarray(pseudo["boxes"][0])
    our_scores = np.asarray(pseudo["scores"][0])
    assert np.asarray(pseudo["valid"][0]).all()

    np.testing.assert_array_equal(ref["pl_labels"], np.asarray(CAP_IDS))
    np.testing.assert_allclose(
        our_scores, ref["pl_scores"], rtol=0, atol=2e-3
    )
    np.testing.assert_allclose(
        our_boxes, ref["pl_boxes"], rtol=0, atol=0.15
    )


def test_pseudo_mask_parity(ref, ours):
    """The teacher's distillation mask targets agree: our box-local
    binary 14x14 masks, pasted onto the image at the pseudo boxes, match
    the reference's Masker-pasted SegmentationMask pixels."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.ops.masks import (
        paste_masks_np,
    )

    pseudo = ours["pseudo"]
    our_local = np.asarray(pseudo["masks"][0])  # [W, 14, 14] binary
    boxes = np.asarray(pseudo["boxes"][0])
    pasted = paste_masks_np(our_local, boxes, (IMG_H, IMG_W), 0.5, 1)

    ref_masks = ref["pl_masks"]
    if ref_masks.ndim == 2:  # single-instance squeeze
        ref_masks = ref_masks[None]
    assert pasted.shape == ref_masks.shape
    mismatch = (pasted != ref_masks).mean()
    assert mismatch < 0.005, f"pasted pseudo-mask pixel mismatch {mismatch}"


def test_st_eval_parity(ref, ours):
    """Eval = student heads + teacher vocabulary: same detections."""
    ev = ours["ev"]
    valid = np.asarray(ev.detections.valid[0])
    boxes = np.asarray(ev.detections.boxes[0])[valid]
    scores = np.asarray(ev.detections.scores[0])[valid]
    labels = np.asarray(ev.detections.labels[0])[valid]

    rb, rs, rl = ref["ev_boxes"], ref["ev_scores"], ref["ev_labels"]
    assert len(rb) > 3, "degenerate oracle: <4 student detections"
    pairs = _greedy_match(rb, rl, boxes, labels, iou_thresh=0.9)
    assert len(pairs) / len(rb) >= 0.9, f"{len(pairs)}/{len(rb)} matched"
    assert len(pairs) / max(len(boxes), 1) >= 0.9
    sd = max(abs(rs[r] - scores[o]) for r, o in pairs)
    assert sd < 2e-3, f"max score diff {sd}"


# ---------------------------------------------------------------------------
# ST training-loss parity: reference STGeneralizedRCNN train forward
# (st_generalized_rcnn.py:284-408, UNCERTAINTY off) vs our fused step,
# same .pth, caption image + detection image in one batch.  Pool sizes
# pinned so both samplers keep every candidate: caption branch pool =
# POST_NMS_TOP_N_TEST (no gt append at the eval selector), det branch
# pool = POST_NMS_TOP_N_TRAIN + N_GT.
# ---------------------------------------------------------------------------

N_GT_ST = 3
POST_NMS_TRAIN_ST = POST_NMS - N_GT_ST  # 61: det pool == pseudo pool


def _st_train_cfgs():
    rc = _ref_cfg()
    rc.MODEL.UNCERTAINTY = False
    # the DEFAULT is 0.0, which scales every pseudo loss to zero and
    # would make pseudo-loss parity trivially true; use the shipped
    # configs' value (student_teacher_mask_rcnn_uncertainty.yaml:19)
    rc.MODEL.LAMBDA_PSEUDO_LABEL = 0.1
    rc.MODEL.RPN.POST_NMS_TOP_N_TRAIN = POST_NMS_TRAIN_ST
    rc.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = PRE_NMS
    rc.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = POST_NMS
    oc = _our_cfg()
    oc.MODEL.UNCERTAINTY = False
    oc.MODEL.LAMBDA_PSEUDO_LABEL = 0.1
    oc.MODEL.RPN.POST_NMS_TOP_N_TRAIN = POST_NMS_TRAIN_ST
    oc.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = PRE_NMS
    oc.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = POST_NMS
    return rc, oc


def test_st_training_loss_parity(tmp_path):
    build = install_reference_full()
    _patch_reference_bert()
    from maskrcnn_benchmark.structures.bounding_box import BoxList
    from maskrcnn_benchmark.structures.image_list import to_image_list
    from maskrcnn_benchmark.structures.segmentation_mask import (
        SegmentationMask,
    )

    rc, oc = _st_train_cfgs()
    ref_model = build(rc)
    rng = np.random.RandomState(11)
    orig = ref_model.state_dict()
    ref_model.load_state_dict(
        _tame_state_dict(_randomize_state_dict(orig, rng), orig)
    )
    ref_model.train()

    class_emb = (0.3 * rng.randn(NUM_CLASSES, EMB_DIM)).astype(np.float32)
    ref_model.roi_heads.box.predictor.set_class_embeddings(
        torch.from_numpy(class_emb)
    )

    img_cap = rng.randn(3, IMG_H, IMG_W).astype(np.float32)
    img_det = rng.randn(3, IMG_H, IMG_W).astype(np.float32)

    # caption target: noun words + LVIS ids, no boxes
    t_cap = BoxList(torch.zeros((len(CAP_WORDS), 4)), (IMG_W, IMG_H))
    t_cap.add_field("ids_cap", torch.tensor(CAP_IDS))
    t_cap.add_field("nn_caption", "/".join(CAP_WORDS))
    t_cap.add_field("is_det", "No")
    t_cap.add_field("labels", torch.tensor(CAP_IDS))

    # detection target: boxes + rect masks
    gb = np.array(
        [[10.0, 8.0, 60.0, 50.0], [50.0, 30.0, 120.0, 90.0],
         [4.0, 60.0, 40.0, 92.0]],
        np.float32,
    )
    gl = np.array([1, 2, 4], np.int64)
    gm = np.zeros((N_GT_ST, IMG_H, IMG_W), np.uint8)
    for i, (x1, y1, x2, y2) in enumerate(gb):
        gm[i, int(y1) + 2 : int(y2) - 3, int(x1) + 3 : int(x2) - 4] = 1
    t_det = BoxList(torch.from_numpy(gb), (IMG_W, IMG_H))
    t_det.add_field("labels", torch.from_numpy(gl))
    t_det.add_field(
        "masks",
        SegmentationMask(torch.from_numpy(gm), (IMG_W, IMG_H), mode="mask"),
    )
    t_det.add_field("nn_caption", "")
    t_det.add_field("is_det", "Yes")

    # The reference's train forward indexes the FEATURE-LEVEL list by
    # IMAGE index (st_generalized_rcnn.py:362-368 features[idx]), so any
    # mixed batch of size >= 2 crashes on a single-level backbone — it
    # only ever ran at per-GPU batch 1 (global 8 / 8 GPUs).  Oracle the
    # composite by running it twice at batch 1, like its real runs.
    # the engine normally sets this from the dataset (trainer.py:85-90)
    ref_model.class_names = [f"c{i}" for i in range(NUM_CLASSES)]
    ref_losses = {}
    cap_losses = ref_model(
        to_image_list([torch.from_numpy(img_cap)], 32), [t_cap]
    )
    det_losses = ref_model(
        to_image_list([torch.from_numpy(img_det)], 32), [t_det]
    )
    for k in ("loss_classifier_pseudo", "loss_box_reg_pseudo",
              "loss_mask_pseudo"):
        ref_losses[k] = float(cap_losses[k].detach())
    for k in ("loss_classifier", "loss_box_reg", "loss_mask"):
        ref_losses[k] = float(det_losses[k].detach())
    # the reference's student caption vocabulary after prepare_model
    lvis_embs = ref_model.cap_embs.detach().numpy()

    pth = tmp_path / "ref_st_train.pth"
    torch.save(ref_model.state_dict(), str(pth))

    # ---- ours ---------------------------------------------------------
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.datasets.coco import (
        rasterize_instance_mask,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        import_torch_state_dict,
        load_torch_checkpoint,
        populate_student_from_teacher,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.st_generalized_rcnn import (
        STGeneralizedRCNN,
        st_statics_from_cfg,
    )

    statics = st_statics_from_cfg(oc)._replace(
        vocab_size=len(VOCAB), lvis_vocab=lvis_embs.shape[0]
    )
    model = STGeneralizedRCNN(statics)

    ids, mask = tokenize_words(CAP_WORDS)
    nw = len(CAP_WORDS)
    polys = []
    for x1, y1, x2, y2 in gb:
        ix1, iy1 = int(x1) + 3, int(y1) + 2
        ix2, iy2 = int(x2) - 4, int(y2) - 3
        polys.append([[ix1, iy1, ix2, iy1, ix2, iy2, ix1, iy2]])
    local = np.stack(
        [
            rasterize_instance_mask(polys[i], gb[i], (IMG_H, IMG_W), 28)
            for i in range(N_GT_ST)
        ]
    )
    batch = {
        "cap_mask": jnp.array([True, False]),
        "det_mask": jnp.array([False, True]),
        "cap_tok_ids": jnp.asarray(np.stack([ids, np.zeros_like(ids)])),
        "cap_tok_mask": jnp.asarray(np.stack([mask, np.zeros_like(mask)])),
        "cap_word_valid": jnp.array([[True] * nw, [False] * nw]),
        "cap_labels": jnp.asarray(
            np.stack([np.asarray(CAP_IDS), np.zeros(nw)]).astype(np.int32)
        ),
        "gt_boxes": jnp.asarray(np.stack([np.zeros_like(gb), gb])),
        "gt_labels": jnp.asarray(
            np.stack([np.zeros_like(gl), gl]).astype(np.int32)
        ),
        "gt_valid": jnp.array([[False] * N_GT_ST, [True] * N_GT_ST]),
        "gt_masks": jnp.asarray(
            np.stack([np.zeros_like(local), local]).astype(np.float32)
        ),
    }
    images_j = jnp.asarray(
        np.stack([img_cap.transpose(1, 2, 0), img_det.transpose(1, 2, 0)])
    )
    sizes = jnp.array([[IMG_H, IMG_W]] * 2, jnp.int32)

    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        images_j,
        sizes,
        batch,
        jnp.asarray(class_emb),
        jnp.asarray(lvis_embs),
        train=True,
    )
    sd = load_torch_checkpoint(str(pth))
    new_params, _ = import_torch_state_dict(params["params"], sd)
    # the reference saved AFTER prepare_model copied teacher->student,
    # so the .pth already carries both bundles; the copy is a no-op but
    # mirrors the real flow
    new_params, _ = populate_student_from_teacher(new_params)
    out = model.apply(
        {"params": new_params},
        images_j,
        sizes,
        batch,
        jnp.asarray(class_emb),
        jnp.asarray(lvis_embs),
        train=True,
        rngs={"sampler": jax.random.PRNGKey(2)},
    )
    ours = {k: float(v) for k, v in out.losses.items()}
    assert set(ours) == set(ref_losses), set(ours) ^ set(ref_losses)
    for k in ref_losses:
        tol = 0.15 if "mask" in k else 2e-2
        assert abs(ours[k] - ref_losses[k]) <= tol * max(
            1.0, abs(ref_losses[k])
        ), f"{k}: ours {ours[k]:.6f} vs reference {ref_losses[k]:.6f}"


def test_st_ft_emb_gradient_parity(tmp_path):
    """FT_EMB end-to-end grad oracle.  With MODEL.LANGUAGE_BACKBONE.
    FT_EMB the reference's word-embedding table is a trainable
    nn.Parameter (transformers.py:24) and prepare_model recomputes the
    LVIS class table from it every training forward, storing it
    undetached (st_generalized_rcnn.py:190-191,
    roi_box_predictors.py:84-92) — so the pseudo-branch classification
    loss backprops into the table.  Our in-step rebuild
    (lvis_name_ids in the batch) must produce (a) the same class table
    and (b) the same d loss_classifier_pseudo / d word_embeddings."""
    build = install_reference_full()
    _patch_reference_bert()
    from maskrcnn_benchmark.structures.bounding_box import BoxList
    from maskrcnn_benchmark.structures.image_list import to_image_list

    rc, oc = _st_train_cfgs()
    rc.MODEL.LANGUAGE_BACKBONE.FT_EMB = True
    ref_model = build(rc)
    rng = np.random.RandomState(11)
    orig = ref_model.state_dict()
    ref_model.load_state_dict(
        _tame_state_dict(_randomize_state_dict(orig, rng), orig)
    )
    ref_model.train()
    assert ref_model.bert.embeddings.requires_grad

    class_emb = (0.3 * rng.randn(NUM_CLASSES, EMB_DIM)).astype(np.float32)
    ref_model.roi_heads.box.predictor.set_class_embeddings(
        torch.from_numpy(class_emb)
    )
    ref_model.class_names = [f"c{i}" for i in range(NUM_CLASSES)]

    img_cap = rng.randn(3, IMG_H, IMG_W).astype(np.float32)
    t_cap = BoxList(torch.zeros((len(CAP_WORDS), 4)), (IMG_W, IMG_H))
    t_cap.add_field("ids_cap", torch.tensor(CAP_IDS))
    t_cap.add_field("nn_caption", "/".join(CAP_WORDS))
    t_cap.add_field("is_det", "No")
    t_cap.add_field("labels", torch.tensor(CAP_IDS))

    cap_losses = ref_model(
        to_image_list([torch.from_numpy(img_cap)], 32), [t_cap]
    )
    cap_losses["loss_classifier_pseudo"].backward()
    g_ref = ref_model.bert.embeddings.grad.detach().numpy()
    assert np.abs(g_ref).sum() > 0
    ref_table = ref_model.cap_embs.detach().numpy()

    pth = tmp_path / "ref_st_ftemb.pth"
    torch.save(ref_model.state_dict(), str(pth))

    # ---- ours ---------------------------------------------------------
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        import_torch_state_dict,
        load_torch_checkpoint,
        populate_student_from_teacher,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.st_generalized_rcnn import (
        STGeneralizedRCNN,
        st_statics_from_cfg,
    )

    name_ids, name_mask = tokenize_words(list(ref_model.cap_vocab))
    statics = st_statics_from_cfg(oc)._replace(
        vocab_size=len(VOCAB), lvis_vocab=name_ids.shape[0]
    )
    model = STGeneralizedRCNN(statics)

    ids, mask = tokenize_words(CAP_WORDS)
    nw = len(CAP_WORDS)
    batch = {
        "cap_mask": jnp.array([True]),
        "det_mask": jnp.array([False]),
        "cap_tok_ids": jnp.asarray(ids)[None],
        "cap_tok_mask": jnp.asarray(mask)[None],
        "cap_word_valid": jnp.array([[True] * nw]),
        "cap_labels": jnp.asarray(np.asarray(CAP_IDS, np.int32))[None],
        "gt_boxes": jnp.zeros((1, N_GT_ST, 4)),
        "gt_labels": jnp.zeros((1, N_GT_ST), jnp.int32),
        "gt_valid": jnp.zeros((1, N_GT_ST), bool),
        "gt_masks": jnp.zeros((1, N_GT_ST, 28, 28)),
        "lvis_name_ids": jnp.asarray(name_ids),
        "lvis_name_mask": jnp.asarray(name_mask),
    }
    images_j = jnp.asarray(img_cap.transpose(1, 2, 0))[None]
    sizes = jnp.array([[IMG_H, IMG_W]], jnp.int32)
    lvis_placeholder = jnp.zeros((name_ids.shape[0], EMB_DIM))

    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        images_j,
        sizes,
        batch,
        jnp.asarray(class_emb),
        lvis_placeholder,
        train=True,
    )
    sd = load_torch_checkpoint(str(pth))
    new_params, _ = import_torch_state_dict(params["params"], sd)
    new_params, _ = populate_student_from_teacher(new_params)

    # (a) the in-step table matches the reference's recomputed cap_embs
    our_table = model.apply(
        {"params": new_params},
        jnp.asarray(name_ids),
        jnp.asarray(name_mask),
        method=STGeneralizedRCNN.extract_word_embeddings,
    )
    np.testing.assert_allclose(
        np.asarray(our_table), ref_table, atol=2e-5
    )

    # (b) gradient of the pseudo cls loss into the word-embedding table
    def loss_fn(p):
        out = model.apply(
            {"params": p},
            images_j,
            sizes,
            batch,
            jnp.asarray(class_emb),
            lvis_placeholder,
            train=True,
            rngs={"sampler": jax.random.PRNGKey(2)},
        )
        return out.losses["loss_classifier_pseudo"]

    g_ours = np.asarray(
        jax.grad(loss_fn)(new_params)["bert"]["word_embeddings"]
    )
    assert np.abs(g_ours).sum() > 0
    cos = float(
        (g_ref * g_ours).sum()
        / max(np.linalg.norm(g_ref) * np.linalg.norm(g_ours), 1e-20)
    )
    rel = float(
        np.linalg.norm(g_ours - g_ref) / max(np.linalg.norm(g_ref), 1e-20)
    )
    assert cos > 0.98, f"grad cosine {cos:.4f}"
    assert rel < 0.15, f"grad relative L2 {rel:.4f}"
