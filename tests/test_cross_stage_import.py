"""Cross-stage orbax import (engine/checkpoint.py::import_flax_params).

The documented pipeline trains all three stages in THIS framework, so
stage N+1's MODEL.WEIGHT is an orbax checkpoint, not a torch .pth.
These tests pin the reference DetectronCheckpointer surgeries
(reference utils/checkpoint.py:113-126) transplanted into the flax
naming vocabulary: MMSS v2l -> emb_pred, C5 backbone layer4 -> RoI
extractor, GeneralizedRCNN roi modules -> the ST teacher bundle, and
language_backbone <-> bert.

Real param trees are obtained with jax.eval_shape (no compilation), so
any module rename in the models breaks these tests immediately.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
    _flatten_params,
    _unflatten,
    extract_params_tree,
    import_flax_params,
    import_language_table,
    populate_student_from_teacher,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
    GeneralizedRCNN,
    statics_from_cfg,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.mmss_gcnn import (
    MMSSGridModel,
    mmss_statics_from_cfg,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.st_generalized_rcnn import (
    STGeneralizedRCNN,
    st_statics_from_cfg,
)


def _filled(shape_tree):
    """Materializes an eval_shape tree as numpy arrays with distinct
    per-leaf values so copies are detectable."""
    flat = _flatten_params(shape_tree)
    out = {}
    for i, (path, leaf) in enumerate(sorted(flat.items())):
        out[path] = np.full(
            leaf.shape, float(i + 1), dtype=np.float32
        )
    return _unflatten(out)


def _teacher_shapes():
    cfg = get_default_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.CLS_AGNOSTIC_MASK = True
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 16
    cfg.TPU.MAX_GT = 4
    cfg.TPU.NMS_TILE = 64
    model = GeneralizedRCNN(statics_from_cfg(cfg))
    targets = {
        "gt_boxes": jnp.zeros((1, 4, 4)),
        "gt_labels": jnp.zeros((1, 4), jnp.int32),
        "gt_valid": jnp.zeros((1, 4), bool),
        "gt_masks": jnp.zeros((1, 4, 28, 28)),
    }
    return jax.eval_shape(
        lambda: model.init(
            {
                "params": jax.random.PRNGKey(0),
                "sampler": jax.random.PRNGKey(1),
            },
            jnp.zeros((1, 64, 64, 3)),
            jnp.array([[64, 64]], jnp.int32),
            jnp.zeros((8, 16)),
            targets,
            train=True,
        )
    )


def _mmss_shapes():
    cfg = get_default_cfg()
    cfg.MODEL.META_ARCHITECTURE = "MMSS-GCNN"
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-C5"
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 2048
    cfg.MODEL.MMSS_HEAD.TYPES = ("GroundingHead",)
    cfg.MODEL.MMSS_HEAD.DEFAULT_HEAD = "GroundingHead"
    cfg.MODEL.MMSS_HEAD.TIE_VL_PROJECTION_WEIGHTS = True
    cfg.MODEL.MMSS_HEAD.GROUNDING.LOCAL_METRIC = "dot"
    cfg.MODEL.MMSS_HEAD.GROUNDING.ALIGNMENT = "softmax"
    cfg.MODEL.MMSS_HEAD.GROUNDING.LOSS = "cross_entropy"
    statics = mmss_statics_from_cfg(cfg)._replace(l_dim=16, vocab_size=64)
    model = MMSSGridModel(statics)
    captions = {
        "input_ids": jnp.zeros((1, 6), jnp.int32),
        "attention_mask": jnp.ones((1, 6), jnp.int32),
        "special_tokens_mask": jnp.zeros((1, 6), jnp.int32),
    }
    return jax.eval_shape(
        lambda: model.init(
            {
                "params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "alignment": jax.random.PRNGKey(2),
            },
            jnp.zeros((1, 64, 64, 3)),
            jnp.array([[64, 64]], jnp.int32),
            captions,
            train=True,
        )
    )


def _st_shapes():
    cfg = get_default_cfg()
    cfg.MODEL.META_ARCHITECTURE = "STGeneralizedRCNN"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.CLS_AGNOSTIC_MASK = True
    cfg.MODEL.UNCERTAINTY = True
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 16
    cfg.TPU.MAX_GT = 4
    cfg.TPU.MAX_CAP_NOUNS = 3
    cfg.TPU.NMS_TILE = 64
    statics = st_statics_from_cfg(cfg)._replace(vocab_size=64, lvis_vocab=20)
    model = STGeneralizedRCNN(statics)
    b, nw, t = 1, 3, 4
    batch = {
        "cap_mask": jnp.zeros((b,), bool),
        "det_mask": jnp.ones((b,), bool),
        "cap_tok_ids": jnp.zeros((b, nw, t), jnp.int32),
        "cap_tok_mask": jnp.ones((b, nw, t), jnp.int32),
        "cap_word_valid": jnp.zeros((b, nw), bool),
        "cap_labels": jnp.zeros((b, nw), jnp.int32),
        "gt_boxes": jnp.zeros((b, 4, 4)),
        "gt_labels": jnp.zeros((b, 4), jnp.int32),
        "gt_valid": jnp.zeros((b, 4), bool),
        "gt_masks": jnp.zeros((b, 4, 28, 28)),
    }
    return jax.eval_shape(
        lambda: model.init(
            {
                "params": jax.random.PRNGKey(0),
                "sampler": jax.random.PRNGKey(1),
                "uncertainty": jax.random.PRNGKey(2),
            },
            jnp.zeros((b, 64, 64, 3)),
            jnp.array([[64, 64]], jnp.int32),
            batch,
            jnp.zeros((8, 16)),
            jnp.zeros((20, 16)),
            train=True,
        )
    )


@pytest.fixture(scope="module")
def teacher_params():
    return _filled(_teacher_shapes()["params"])


@pytest.fixture(scope="module")
def mmss_params():
    return _filled(_mmss_shapes()["params"])


@pytest.fixture(scope="module")
def st_params():
    return _filled(_st_shapes()["params"])


def test_mmss_to_teacher(teacher_params, mmss_params):
    new, report = import_flax_params(
        teacher_params, mmss_params, load_emb_pred_from_mmss_head=True,
    )
    tflat = _flatten_params(new)
    sflat = _flatten_params(mmss_params)

    # v2l -> emb_pred (reference checkpoint.py:120-122)
    for leaf in ("kernel", "bias"):
        np.testing.assert_array_equal(
            tflat[("box_predictor", "emb_pred", leaf)],
            sflat[("v2l_projection", leaf)],
        )
    # shared trunk copies identically
    stem_key = next(
        p for p in sflat if p[:2] == ("backbone", "body") and "stem" in p
    )
    np.testing.assert_array_equal(tflat[stem_key], sflat[stem_key])
    # C5 layer4 lands on the RoI extractor
    l4 = next(
        p for p in sflat if p[:3] == ("backbone", "body", "layer4")
    )
    np.testing.assert_array_equal(
        tflat[("roi_extractor",) + l4[2:]], sflat[l4]
    )
    # nothing silently dropped that should match: every backbone leaf
    # (incl. layer4) found a home
    backbone_misses = [
        m for m in report["missed_source_keys"] if m.startswith("backbone")
    ]
    assert backbone_misses == []


def test_teacher_to_st_routes_onto_teacher_bundle(st_params, teacher_params):
    new, report = import_flax_params(st_params, teacher_params)
    tflat = _flatten_params(new)
    sflat = _flatten_params(teacher_params)

    for top in ("roi_extractor", "box_predictor", "mask_predictor"):
        src = [p for p in sflat if p[0] == top]
        assert src, top
        for p in src:
            np.testing.assert_array_equal(
                tflat[("teacher",) + p], sflat[p]
            )
    # trunk + rpn identity
    rpn = next(p for p in sflat if p[0] == "rpn_head")
    np.testing.assert_array_equal(tflat[rpn], sflat[rpn])
    # prepare_model then fills the student from the routed teacher
    new2, copied = populate_student_from_teacher(new)
    f2 = _flatten_params(new2)
    assert copied > 0
    box = next(p for p in sflat if p[0] == "box_predictor")
    np.testing.assert_array_equal(f2[("student",) + box], sflat[box])


def test_mmss_language_backbone_fills_st_bert(st_params, mmss_params):
    new, _ = import_flax_params(st_params, mmss_params)
    tflat = _flatten_params(new)
    sflat = _flatten_params(mmss_params)
    np.testing.assert_array_equal(
        tflat[("bert", "word_embeddings")],
        sflat[("language_backbone", "word_embeddings")],
    )


def test_extract_params_tree_unwraps_train_state(teacher_params):
    raw = {
        "state": {
            "step": 3,
            "params": {"params": teacher_params},
            "opt_state": {},
            "rng": np.zeros(2),
            "extra": None,
        },
        "iteration": 3,
    }
    got = extract_params_tree(raw)
    assert set(got) == set(teacher_params)
    # and an eval-side {"params": tree} dump
    assert set(extract_params_tree({"params": teacher_params})) == set(
        teacher_params
    )


def test_import_language_table_from_orbax_dir(
    tmp_path, st_params, mmss_params
):
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        save_checkpoint,
    )

    state = {
        "state": {"params": {"params": mmss_params}},
        "iteration": 1,
    }
    save_checkpoint(str(tmp_path), state, step=1)

    new, report = import_language_table(st_params, str(tmp_path))
    tflat = _flatten_params(new)
    sflat = _flatten_params(mmss_params)
    np.testing.assert_array_equal(
        tflat[("bert", "word_embeddings")],
        sflat[("language_backbone", "word_embeddings")],
    )
    # ONLY language leaves moved: the MMSS backbone must not clobber
    # the (teacher-trained) trunk
    stem_key = next(
        p for p in sflat if p[:2] == ("backbone", "body") and "stem" in p
    )
    np.testing.assert_array_equal(
        tflat[stem_key], _flatten_params(st_params)[stem_key]
    )
