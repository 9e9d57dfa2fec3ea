"""Baseline meta-architectures (models/detector/baselines.py) — the
reference ships these UNREGISTERED (modeling/detector/baselines/**,
reachable only by editing detectors.py); here they are registered,
build from configs, and train:

* SoftTeacher / UnbiasedTeacher: top-2 confident-region pseudo-labels
  (soft_teacher.py:137-160), sigmoid-confidence sample weights /
  focal-reweighted pseudo CE (their loss.py files).
* SBBaseline / OMP / BA_RPN: GeneralizedRCNN skeletons.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector import (
    build_detection_model,
)

from test_st_model import st_tiny_cfg


def _st_batch(b=2, nw=3, t=4, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "cap_mask": jnp.array([True, False]),
        "det_mask": jnp.array([True, True]),
        "cap_tok_ids": jnp.asarray(rng.randint(5, 64, (b, nw, t)), jnp.int32),
        "cap_tok_mask": jnp.ones((b, nw, t), jnp.int32),
        "cap_word_valid": jnp.array([[True, True, False], [False] * 3]),
        "cap_labels": jnp.asarray(rng.randint(0, 20, (b, nw)), jnp.int32),
        "gt_boxes": jnp.tile(jnp.array([[[4.0, 4.0, 30.0, 30.0]] * 4]), (b, 1, 1)),
        "gt_labels": jnp.ones((b, 4), jnp.int32),
        "gt_valid": jnp.tile(jnp.array([[True, True, False, False]]), (b, 1)),
        "gt_masks": jnp.ones((b, 4, 28, 28)),
    }


@pytest.fixture(scope="module", params=["SoftTeacher", "UnbiasedTeacher"])
def topk_setup(request):
    cfg = st_tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = request.param
    cfg.MODEL.UNCERTAINTY = False
    model = build_detection_model(cfg)
    model = type(model)(
        model.statics._replace(vocab_size=64, lvis_vocab=20)
    )
    b = 2
    images = jnp.asarray(
        np.random.RandomState(1).rand(b, 64, 64, 3), jnp.float32
    )
    image_sizes = jnp.array([[64, 64], [48, 64]], jnp.int32)
    batch = _st_batch(b)
    class_emb = jnp.asarray(
        np.random.RandomState(2).randn(8, 16), jnp.float32
    )
    lvis_emb = jnp.asarray(
        np.random.RandomState(3).randn(20, 16), jnp.float32
    )
    rngs = {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)}
    params = model.init(
        rngs, images, image_sizes, batch, class_emb, lvis_emb, train=True
    )
    return request.param, model, params, images, image_sizes, batch, class_emb, lvis_emb


def test_topk_teacher_trains(topk_setup):
    name, model, params, images, image_sizes, batch, ce, le = topk_setup
    out = model.apply(
        params, images, image_sizes, batch, ce, le, train=True,
        rngs={"sampler": jax.random.PRNGKey(2)},
    )
    for k, v in out.losses.items():
        assert np.isfinite(float(v)), (name, k)
    assert "loss_classifier_pseudo" in out.losses


def test_topk_pseudo_selection(topk_setup):
    """Top-2 selection: 2 pseudo slots per image, labels drawn from
    cap_labels via the argmax word, caption-free image invalid."""
    name, model, params, images, image_sizes, batch, ce, le = topk_setup

    def _pseudo(m, images, image_sizes, b):
        feats = m.backbone(images)
        _, _, _, props = m._rpn_proposals(
            images, image_sizes, feats, train_selector=False
        )
        return m.generate_pseudo_labels(
            feats, props, image_sizes,
            b["cap_tok_ids"], b["cap_tok_mask"], b["cap_word_valid"],
            b["cap_labels"],
        )

    pseudo = model.apply(
        {"params": params["params"]}, images, image_sizes, batch,
        method=_pseudo,
    )
    assert pseudo["boxes"].shape[1] == 2
    assert bool(pseudo["valid"][0].all())
    assert not bool(pseudo["valid"][1].any())  # no caption words
    labels0 = np.asarray(pseudo["labels"][0])
    cap0 = set(np.asarray(batch["cap_labels"][0][:2]))
    assert set(labels0) <= cap0
    assert "weights" in pseudo


def test_soft_vs_unbiased_differ_in_pseudo_loss():
    """The two reweights are different functions of the same selection:
    given identical params/batch, their pseudo classification losses
    differ while the GT-branch losses coincide."""
    results = {}
    for arch in ("SoftTeacher", "UnbiasedTeacher"):
        cfg = st_tiny_cfg()
        cfg.MODEL.META_ARCHITECTURE = arch
        cfg.MODEL.UNCERTAINTY = False
        cfg.MODEL.REWEIGHT = False
        model = build_detection_model(cfg)
        model = type(model)(
            model.statics._replace(vocab_size=64, lvis_vocab=20)
        )
        b = 2
        images = jnp.asarray(
            np.random.RandomState(1).rand(b, 64, 64, 3), jnp.float32
        )
        image_sizes = jnp.array([[64, 64], [48, 64]], jnp.int32)
        batch = _st_batch(b)
        ce = jnp.asarray(np.random.RandomState(2).randn(8, 16), jnp.float32)
        le = jnp.asarray(np.random.RandomState(3).randn(20, 16), jnp.float32)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
            images, image_sizes, batch, ce, le, train=True,
        )
        out = model.apply(
            params, images, image_sizes, batch, ce, le, train=True,
            rngs={"sampler": jax.random.PRNGKey(2)},
        )
        results[arch] = {k: float(v) for k, v in out.losses.items()}
    assert (
        results["SoftTeacher"]["loss_classifier_pseudo"]
        != results["UnbiasedTeacher"]["loss_classifier_pseudo"]
    )
    assert (
        results["SoftTeacher"]["loss_classifier"]
        == results["UnbiasedTeacher"]["loss_classifier"]
    )


@pytest.mark.parametrize("arch", ["SBBaseline", "OMP", "BA_RPN"])
def test_rcnn_skeleton_baselines(arch):
    from test_generalized_rcnn import tiny_cfg

    cfg = tiny_cfg()
    cfg.MODEL.META_ARCHITECTURE = arch
    model = build_detection_model(cfg)
    images = jnp.zeros((1, 64, 64, 3))
    image_sizes = jnp.array([[64, 64]], jnp.int32)
    class_emb = jnp.asarray(np.random.RandomState(0).randn(8, 16), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, images, image_sizes, class_emb,
        train=False,
    )
    out = model.apply(params, images, image_sizes, class_emb, train=False)
    assert out.detections.boxes.shape[1] == 8
