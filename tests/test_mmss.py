import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.mmss_gcnn import (
    MMSSGridModel,
    grid_region_inputs,
    mmss_statics_from_cfg,
    spatial_dropout_select,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.models.mmss.grounding_head import (
    GroundingHead,
    GroundingStatics,
)


def test_grid_region_inputs_masks_padding():
    feats = jnp.ones((2, 4, 6, 8))
    image_sizes = jnp.array([[128, 192], [64, 96]])  # padded to 128x192
    rf, mask, loc = grid_region_inputs(feats, image_sizes, (128, 192))
    assert rf.shape == (2, 24, 8)
    m = np.asarray(mask).reshape(2, 4, 6)
    # image 0 fills the grid; image 1 covers ceil(64*4/128)=2 rows,
    # ceil(96*6/192)=3 cols
    assert m[0].all()
    assert m[1, :2, :3].all() and m[1, 2:, :].sum() == 0 and m[1, :, 3:].sum() == 0
    l = np.asarray(loc).reshape(2, 4, 6, 2)
    np.testing.assert_allclose(l[1, 0, 0], [0.5 / 3, 0.25], atol=1e-6)


def test_spatial_dropout_select():
    key = jax.random.PRNGKey(0)
    rf = jnp.arange(2 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 3)
    mask = jnp.array([[True] * 10, [True] * 4 + [False] * 6])
    loc = jnp.zeros((2, 10, 2))
    srf, smask, sloc = spatial_dropout_select(rf, mask, loc, 6, key)
    assert srf.shape == (2, 6, 3)
    assert int(smask[0].sum()) == 6
    assert int(smask[1].sum()) == 4  # only 4 valid available


def grounding_inputs(b=4, r=5, w=3, d=8, seed=0):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.randn(b, r, d).astype(np.float32))
    cap = jnp.asarray(rng.randn(b, w, d).astype(np.float32))
    rm = jnp.ones((b, r), bool)
    cm = jnp.ones((b, w), bool)
    return img, rm, cap, cm


@pytest.mark.parametrize("loss_type", ["cross_entropy", "triplet"])
@pytest.mark.parametrize("alignment", ["softmax", "hardmax"])
def test_grounding_head_losses_finite(loss_type, alignment):
    statics = GroundingStatics(
        local_metric="dot",
        global_metric="aligned_local",
        alignment=alignment,
        temperature=10.0,
        loss_type=loss_type,
        negative_mining="hardest",
    )
    head = GroundingHead(statics, l_dim=8)
    img, rm, cap, cm = grounding_inputs()
    params = head.init(jax.random.PRNGKey(0), img, rm, cap, cm)
    info, losses = head.apply(params, img, rm, cap, cm)
    assert losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    for k, v in info.items():
        assert 0.0 <= float(v) <= 1.0


def test_grounding_identical_pair_prefers_diagonal():
    # make caption i exactly match image i's regions -> contrastive
    # accuracy should be perfect
    rng = np.random.RandomState(1)
    b, r, d = 4, 6, 16
    img = rng.randn(b, r, d).astype(np.float32) * 10
    cap = img[:, :3, :].copy()  # words = first 3 regions
    statics = GroundingStatics(
        local_metric="dot",
        global_metric="aligned_local",
        alignment="softmax",
        temperature=10.0,
        loss_type="cross_entropy",
    )
    head = GroundingHead(statics, l_dim=d)
    rm = jnp.ones((b, r), bool)
    cm = jnp.ones((b, 3), bool)
    params = head.init(
        jax.random.PRNGKey(0), jnp.asarray(img), rm, jnp.asarray(cap), cm
    )
    info, _ = head.apply(
        params, jnp.asarray(img), rm, jnp.asarray(cap), cm
    )
    assert info["Batch Accuracy (Align Words, Choose Caption)"] == 1.0
    assert info["Batch Accuracy (Align Words, Choose Image)"] == 1.0


def mmss_tiny_cfg():
    cfg = get_default_cfg()
    cfg.MODEL.META_ARCHITECTURE = "MMSS-GCNN"
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-C5"
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 2048
    cfg.MODEL.MMSS_HEAD.TYPES = ("GroundingHead", "TransformerHead")
    cfg.MODEL.MMSS_HEAD.DEFAULT_HEAD = "GroundingHead"
    cfg.MODEL.MMSS_HEAD.TIE_VL_PROJECTION_WEIGHTS = True
    cfg.MODEL.MMSS_HEAD.SPATIAL_DROPOUT = 10
    cfg.MODEL.MMSS_HEAD.GROUNDING.LOCAL_METRIC = "dot"
    cfg.MODEL.MMSS_HEAD.GROUNDING.ALIGNMENT = "softmax"
    cfg.MODEL.MMSS_HEAD.GROUNDING.ALIGNMENT_TEMPERATURE = 10.0
    cfg.MODEL.MMSS_HEAD.GROUNDING.LOSS = "cross_entropy"
    t = cfg.MODEL.MMSS_HEAD.TRANSFORMER
    t.MASKED_LANGUAGE_MODELING = True
    t.MMM_LOSS = "cross_entropy"
    t.BERT_CONFIG.vocab_size = 64
    t.BERT_CONFIG.hidden_size = 32
    t.BERT_CONFIG.num_hidden_layers = 2
    t.BERT_CONFIG.num_attention_heads = 2
    t.BERT_CONFIG.intermediate_size = 32
    return cfg


def test_mmss_model_forward():
    cfg = mmss_tiny_cfg()
    statics = mmss_statics_from_cfg(cfg)
    # shrink the language/backbone dims for the test
    statics = statics._replace(
        l_dim=32, vocab_size=64, bert_layers=2, bert_heads=2,
        bert_intermediate=32, mask_token_id=4,
    )
    model = MMSSGridModel(statics)
    b, w = 2, 10
    images = jnp.zeros((b, 64, 64, 3))
    image_sizes = jnp.array([[64, 64], [32, 48]])
    rng = np.random.RandomState(0)
    captions = {
        "input_ids": jnp.asarray(rng.randint(5, 64, (b, w)), jnp.int32),
        "attention_mask": jnp.ones((b, w), jnp.int32),
        "special_tokens_mask": jnp.asarray(
            np.eye(1, w, 0, dtype=np.int32).repeat(b, 0)
        ),
    }
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "mlm": jax.random.PRNGKey(2),
    }
    params = model.init(rngs, images, image_sizes, captions, train=True)
    info, losses = model.apply(
        params,
        images,
        image_sizes,
        captions,
        train=True,
        rngs={"dropout": jax.random.PRNGKey(3), "mlm": jax.random.PRNGKey(4)},
    )
    assert "Masked Language Modeling Loss" in losses
    assert "Image Caption Matching Loss" in losses
    assert any("Cross-Entropy" in k for k in losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_mmss_model_bfloat16_matches_float32():
    """Mixed precision (TPU.COMPUTE_DTYPE=bfloat16) runs the BERT/head
    matmuls in bf16 with fp32 params/losses; with identical params the
    loss dict must track the fp32 one closely."""
    cfg = mmss_tiny_cfg()
    statics = mmss_statics_from_cfg(cfg)._replace(
        l_dim=32, vocab_size=64, bert_layers=2, bert_heads=2,
        bert_intermediate=32, mask_token_id=4,
    )
    model32 = MMSSGridModel(statics)
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    statics16 = mmss_statics_from_cfg(cfg)._replace(
        l_dim=32, vocab_size=64, bert_layers=2, bert_heads=2,
        bert_intermediate=32, mask_token_id=4,
    )
    model16 = MMSSGridModel(statics16)
    assert statics16.backbone.compute_dtype == "bfloat16"

    b, w = 2, 10
    images = jnp.zeros((b, 64, 64, 3))
    image_sizes = jnp.array([[64, 64], [32, 48]])
    rng = np.random.RandomState(0)
    captions = {
        "input_ids": jnp.asarray(rng.randint(5, 64, (b, w)), jnp.int32),
        "attention_mask": jnp.ones((b, w), jnp.int32),
        "special_tokens_mask": jnp.asarray(
            np.eye(1, w, 0, dtype=np.int32).repeat(b, 0)
        ),
    }
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "mlm": jax.random.PRNGKey(2),
    }
    params = model32.init(rngs, images, image_sizes, captions, train=True)
    # params are float32 in both modes
    assert all(
        p.dtype == jnp.float32
        for p in jax.tree_util.tree_leaves(params["params"])
    )
    apply_rngs = {
        "dropout": jax.random.PRNGKey(3),
        "mlm": jax.random.PRNGKey(4),
    }
    _, l32 = model32.apply(
        params, images, image_sizes, captions, train=True, rngs=apply_rngs
    )
    _, l16 = model16.apply(
        params, images, image_sizes, captions, train=True, rngs=apply_rngs
    )
    assert set(l32) == set(l16)
    for k in l32:
        a, bb = float(l32[k]), float(l16[k])
        assert np.isfinite(bb), k
        assert abs(a - bb) <= 0.05 * max(1.0, abs(a)), (k, a, bb)
