"""Module-level forward-parity tests against the REFERENCE
implementation (VERDICT r1, next-round item 1 fallback).

The reference's pure-torch math modules import on CPU via
tests/ref_oracle.py (apex/yacs/_C stubbed); each test feeds identical
random inputs to the reference torch module and to our JAX
re-implementation and asserts numerical agreement.  This is the
accuracy-parity anchor available in this environment (no network: the
released .pth files and real COCO data cannot be fetched).
"""

import numpy as np
import pytest
import torch

from ref_oracle import ref_module

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402


# ---------------------------------------------------------------------------
# BoxCoder (modeling/box_coder.py:7-95)
# ---------------------------------------------------------------------------

def _rand_boxes(rng, n, w=640, h=480):
    x1 = rng.uniform(0, w - 20, n)
    y1 = rng.uniform(0, h - 20, n)
    bw = rng.uniform(1, w / 3, n)
    bh = rng.uniform(1, h / 3, n)
    return np.stack([x1, y1, x1 + bw, y1 + bh], 1).astype(np.float32)


@pytest.mark.parametrize("weights", [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)])
def test_box_coder_encode_decode_parity(weights):
    from cvpr22_cross_modal_pseudo_labeling_tpu.core.box_coder import (
        decode_boxes,
        encode_boxes,
    )

    ref_coder = ref_module("modeling.box_coder").BoxCoder(weights=weights)
    rng = np.random.RandomState(0)
    props = _rand_boxes(rng, 64)
    gts = _rand_boxes(rng, 64)

    ref_enc = ref_coder.encode(
        torch.from_numpy(gts), torch.from_numpy(props)
    ).numpy()
    ours_enc = np.asarray(encode_boxes(jnp.asarray(gts), jnp.asarray(props), weights))
    np.testing.assert_allclose(ours_enc, ref_enc, rtol=1e-5, atol=1e-5)

    codes = rng.randn(64, 4).astype(np.float32)
    ref_dec = ref_coder.decode(
        torch.from_numpy(codes), torch.from_numpy(props)
    ).numpy()
    ours_dec = np.asarray(decode_boxes(jnp.asarray(codes), jnp.asarray(props), weights))
    np.testing.assert_allclose(
        ours_dec, ref_dec.reshape(ours_dec.shape), rtol=1e-4, atol=1e-3
    )


def test_box_coder_multiclass_decode_parity():
    """decode with K*4 codes (per-class regression layout)."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.core.box_coder import (
        decode_boxes,
    )

    ref_coder = ref_module("modeling.box_coder").BoxCoder(
        weights=(10.0, 10.0, 5.0, 5.0)
    )
    rng = np.random.RandomState(1)
    props = _rand_boxes(rng, 32)
    codes = rng.randn(32, 12).astype(np.float32)
    ref_dec = ref_coder.decode(
        torch.from_numpy(codes), torch.from_numpy(props)
    ).numpy().reshape(32, 12)
    ours = np.asarray(
        decode_boxes(jnp.asarray(codes), jnp.asarray(props), (10.0, 10.0, 5.0, 5.0))
    )
    np.testing.assert_allclose(ours, ref_dec, rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# boxlist_iou (structures/boxlist_ops.py:53-88, the legacy +1 IoU)
# ---------------------------------------------------------------------------

def test_box_iou_parity():
    from cvpr22_cross_modal_pseudo_labeling_tpu.core.boxes import box_iou

    ops = ref_module("structures.boxlist_ops")
    BoxList = ref_module("structures.bounding_box").BoxList
    rng = np.random.RandomState(2)
    a = _rand_boxes(rng, 40)
    b = _rand_boxes(rng, 25)
    ref = ops.boxlist_iou(
        BoxList(torch.from_numpy(a), (640, 480)),
        BoxList(torch.from_numpy(b), (640, 480)),
    ).numpy()
    ours = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Matcher (modeling/matcher.py:5-112)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("low_quality", [False, True])
@pytest.mark.parametrize("thresholds", [(0.7, 0.3), (0.5, 0.5)])
def test_matcher_parity(low_quality, thresholds):
    from cvpr22_cross_modal_pseudo_labeling_tpu.core.matcher import (
        BELOW_LOW_THRESHOLD,
        BETWEEN_THRESHOLDS,
        match_boxes,
    )

    RefMatcher = ref_module("modeling.matcher").Matcher
    hi, lo = thresholds
    ref_matcher = RefMatcher(hi, lo, allow_low_quality_matches=low_quality)
    rng = np.random.RandomState(3)
    # include exact ties to exercise the tie-recovery path
    q = rng.rand(6, 80).astype(np.float32)
    q[:, 40:50] = q[:, 30:40]
    ref = ref_matcher(torch.from_numpy(q)).numpy()
    ours = np.asarray(
        match_boxes(jnp.asarray(q), jnp.ones(6, bool), hi, lo, low_quality)
    )
    # same negative-code vocabulary (-1 / -2)
    assert BELOW_LOW_THRESHOLD == -1 and BETWEEN_THRESHOLDS == -2
    np.testing.assert_array_equal(ours, ref)


# ---------------------------------------------------------------------------
# AnchorGenerator (modeling/rpn/anchor_generator.py)
# ---------------------------------------------------------------------------

def test_cell_anchors_parity():
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.rpn.anchors import (
        generate_cell_anchors,
    )

    ag = ref_module("modeling.rpn.anchor_generator")
    ref = ag.generate_anchors(
        16, (32, 64, 128, 256, 512), (0.5, 1.0, 2.0)
    ).numpy()
    ours = generate_cell_anchors(16, (32, 64, 128, 256, 512), (0.5, 1.0, 2.0))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-4)


def test_grid_anchors_and_visibility_parity():
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.rpn.anchors import (
        anchor_visibility,
        build_anchors_for_levels,
    )

    ag = ref_module("modeling.rpn.anchor_generator")
    ImageList = ref_module("structures.image_list").ImageList
    gen = ag.AnchorGenerator(
        sizes=(32, 64, 128, 256, 512),
        aspect_ratios=(0.5, 1.0, 2.0),
        anchor_strides=(16,),
        straddle_thresh=0,
    )
    h, w = 50, 68  # feature map
    img_h, img_w = 800, 1088
    feat = torch.zeros(1, 1, h, w)
    il = ImageList(torch.zeros(1, 3, img_h, img_w), [(img_h, img_w)])
    (ref_boxlists,) = gen(il, [feat])
    (ref_bl,) = ref_boxlists
    ref_anchors = ref_bl.bbox.numpy()
    ref_vis = ref_bl.get_field("visibility").numpy().astype(bool)

    (ours,) = build_anchors_for_levels(
        [(h, w)], (16,), (32, 64, 128, 256, 512), (0.5, 1.0, 2.0)
    )
    np.testing.assert_allclose(np.asarray(ours), ref_anchors, atol=1e-4)
    vis = np.asarray(
        anchor_visibility(ours, jnp.asarray([img_h, img_w]), 0.0)
    )
    np.testing.assert_array_equal(vis, ref_vis)


# ---------------------------------------------------------------------------
# FrozenBatchNorm2d (layers/batch_norm.py:6-25)
# ---------------------------------------------------------------------------

def test_frozen_batch_norm_parity():
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.resnet import (
        FrozenBatchNorm,
    )

    RefFBN = ref_module("layers.batch_norm").FrozenBatchNorm2d
    rng = np.random.RandomState(4)
    c = 16
    ref = RefFBN(c)
    ref.weight.copy_(torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5))
    ref.bias.copy_(torch.from_numpy(rng.randn(c).astype(np.float32)))
    ref.running_mean.copy_(torch.from_numpy(rng.randn(c).astype(np.float32)))
    ref.running_var.copy_(
        torch.from_numpy(rng.rand(c).astype(np.float32) + 0.2)
    )
    x = rng.randn(2, c, 8, 8).astype(np.float32)
    ref_y = ref(torch.from_numpy(x)).numpy()

    fbn = FrozenBatchNorm(features=c)
    params = {
        "params": {
            "frozen_bn_weight": jnp.asarray(ref.weight.numpy()),
            "frozen_bn_bias": jnp.asarray(ref.bias.numpy()),
            "frozen_bn_mean": jnp.asarray(ref.running_mean.numpy()),
            "frozen_bn_var": jnp.asarray(ref.running_var.numpy()),
        }
    }
    ours = np.asarray(
        fbn.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref_y, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# smooth_l1_loss (layers/smooth_l1_loss.py)
# ---------------------------------------------------------------------------

def test_smooth_l1_parity():
    from cvpr22_cross_modal_pseudo_labeling_tpu.ops import smooth_l1_loss

    ref_fn = ref_module("layers.smooth_l1_loss").smooth_l1_loss
    rng = np.random.RandomState(5)
    x = rng.randn(128, 4).astype(np.float32) * 3
    y = rng.randn(128, 4).astype(np.float32)
    for beta in (1.0, 1.0 / 9):
        ref = ref_fn(
            torch.from_numpy(x), torch.from_numpy(y), beta=beta,
            size_average=False,
        ).item()
        ours = float(
            jnp.sum(smooth_l1_loss(jnp.asarray(x), jnp.asarray(y), beta=beta))
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


# ---------------------------------------------------------------------------
# RPN proposal selection (modeling/rpn/inference.py:13-152)
# ---------------------------------------------------------------------------

def test_rpn_postprocessor_parity():
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.rpn.anchors import (
        build_anchors_for_levels,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.rpn.rpn import (
        select_proposals_single_level,
    )

    rpn_inf = ref_module("modeling.rpn.inference")
    ag = ref_module("modeling.rpn.anchor_generator")
    ImageList = ref_module("structures.image_list").ImageList
    BoxCoder = ref_module("modeling.box_coder").BoxCoder

    sizes, ratios, stride = (32, 64, 128, 256, 512), (0.5, 1.0, 2.0), 16
    A = len(sizes) * len(ratios)
    h, w = 20, 17
    img_sizes = [(320, 272), (300, 250)]
    B = len(img_sizes)
    rng = np.random.RandomState(6)
    obj = rng.randn(B, A, h, w).astype(np.float32)
    reg = (rng.randn(B, A * 4, h, w) * 0.4).astype(np.float32)

    gen = ag.AnchorGenerator(
        sizes=sizes, aspect_ratios=ratios, anchor_strides=(stride,),
        straddle_thresh=0,
    )
    il = ImageList(
        torch.zeros(B, 3, 320, 272), [(hh, ww) for hh, ww in img_sizes]
    )
    anchors_per_img = gen(il, [torch.zeros(B, 1, h, w)])
    post = rpn_inf.RPNPostProcessor(
        pre_nms_top_n=200, post_nms_top_n=50, nms_thresh=0.7, min_size=0,
        box_coder=BoxCoder(weights=(1.0, 1.0, 1.0, 1.0)),
    )
    post.eval()
    ref_out = post(
        anchors_per_img, [torch.from_numpy(obj)], [torch.from_numpy(reg)]
    )

    (ours_anchors,) = build_anchors_for_levels(
        [(h, w)], (stride,), sizes, ratios
    )
    # [B, A, H, W] -> [B, H*W*A] / [B, H*W*A, 4] (permute_and_flatten order)
    obj_flat = obj.transpose(0, 2, 3, 1).reshape(B, -1)
    reg_flat = (
        reg.reshape(B, A, 4, h, w).transpose(0, 3, 4, 1, 2).reshape(B, -1, 4)
    )
    props = select_proposals_single_level(
        ours_anchors,
        jnp.asarray(obj_flat),
        jnp.asarray(reg_flat),
        jnp.asarray(img_sizes, jnp.int32),
        200, 50, 0.7, 0.0, nms_tile=64,
    )
    for bi in range(B):
        ref_boxes = ref_out[bi].bbox.numpy()
        ref_scores = ref_out[bi].get_field("objectness").numpy()
        n = len(ref_boxes)
        valid = np.asarray(props.valid[bi])
        assert int(valid.sum()) == n
        np.testing.assert_allclose(
            np.asarray(props.boxes[bi])[:n], ref_boxes, rtol=1e-4, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(props.scores[bi])[:n], ref_scores, rtol=1e-5, atol=1e-5
        )


# ---------------------------------------------------------------------------
# Box-head PostProcessor / filter_results
# (modeling/roi_heads/box_head/inference.py:12-193)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cls_agnostic", [True, False])
def test_box_postprocessor_parity(cls_agnostic):
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.roi_heads.box_head import (
        postprocess_boxes,
    )

    box_inf = ref_module("modeling.roi_heads.box_head.inference")
    BoxList = ref_module("structures.bounding_box").BoxList
    BoxCoder = ref_module("modeling.box_coder").BoxCoder

    num_classes, S = 7, 40
    img_w, img_h = 320, 280
    rng = np.random.RandomState(8)
    props = _rand_boxes(rng, S, img_w, img_h)
    logits = (rng.randn(S, num_classes) * 2).astype(np.float32)
    n_reg = 2 if cls_agnostic else num_classes
    deltas = (rng.randn(S, n_reg * 4) * 0.3).astype(np.float32)

    post = box_inf.PostProcessor(
        score_thresh=0.05, nms=0.5, detections_per_img=100,
        box_coder=BoxCoder(weights=(10.0, 10.0, 5.0, 5.0)),
        cls_agnostic_bbox_reg=cls_agnostic,
    )
    post.eval()
    (ref_bl,) = post(
        (torch.from_numpy(logits), torch.from_numpy(deltas)),
        [BoxList(torch.from_numpy(props), (img_w, img_h))],
    )
    ref = sorted(
        zip(
            ref_bl.get_field("labels").numpy().tolist(),
            ref_bl.get_field("scores").numpy().tolist(),
            ref_bl.bbox.numpy().tolist(),
        ),
        key=lambda t: (-t[1], t[0]),
    )

    dets = postprocess_boxes(
        jnp.asarray(logits)[None],
        jnp.asarray(deltas)[None],
        jnp.asarray(props)[None],
        jnp.ones((1, S), bool),
        jnp.asarray([[img_h, img_w]], jnp.int32),
        score_thresh=0.05,
        nms_thresh=0.5,
        detections_per_img=100,
        pre_nms_candidates=S * (num_classes - 1),
        reg_weights=(10.0, 10.0, 5.0, 5.0),
        cls_agnostic_bbox_reg=cls_agnostic,
        nms_tile=64,
    )
    valid = np.asarray(dets.valid[0])
    ours = sorted(
        zip(
            np.asarray(dets.labels[0])[valid].tolist(),
            np.asarray(dets.scores[0])[valid].tolist(),
            np.asarray(dets.boxes[0])[valid].tolist(),
        ),
        key=lambda t: (-t[1], t[0]),
    )
    assert len(ours) == len(ref)
    for (lo, so, bo), (lr, sr, br) in zip(ours, ref):
        assert lo == lr
        np.testing.assert_allclose(so, sr, rtol=1e-4)
        np.testing.assert_allclose(bo, br, rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# Masker paste (modeling/roi_heads/mask_head/inference.py:96-218)
# ---------------------------------------------------------------------------

def test_masker_paste_parity():
    from cvpr22_cross_modal_pseudo_labeling_tpu.ops.masks import (
        paste_masks_np,
    )

    mask_inf = ref_module("modeling.roi_heads.mask_head.inference")
    BoxList = ref_module("structures.bounding_box").BoxList
    rng = np.random.RandomState(9)
    R, M = 6, 28
    img_w, img_h = 200, 160
    masks = rng.rand(R, 1, M, M).astype(np.float32)
    boxes = _rand_boxes(rng, R, img_w, img_h)

    masker = mask_inf.Masker(threshold=0.5, padding=1)
    bl = BoxList(torch.from_numpy(boxes), (img_w, img_h))
    (ref_out,) = masker([torch.from_numpy(masks)], [bl])
    ref_out = ref_out[:, 0].numpy()

    ours = paste_masks_np(masks[:, 0], boxes, (img_h, img_w), 0.5, 1)
    # bilinear resize backends may disagree exactly at the 0.5 threshold
    diff = (ours != ref_out).mean()
    assert diff < 0.002, f"pasted-mask pixel mismatch rate {diff}"


# ---------------------------------------------------------------------------
# ResNet backbone forward + real-key state-dict import
# (modeling/backbone/resnet.py + utils/model_serialization.py semantics)
# ---------------------------------------------------------------------------

def _ref_resnet_cfg():
    from ref_oracle import _CfgNode

    cfg = _CfgNode()
    cfg.MODEL = _CfgNode()
    cfg.MODEL.RESNETS = _CfgNode()
    r = cfg.MODEL.RESNETS
    r.STEM_FUNC = "StemWithFixedBatchNorm"
    r.TRANS_FUNC = "BottleneckWithFixedBatchNorm"
    r.NUM_GROUPS = 1
    r.WIDTH_PER_GROUP = 64
    r.STEM_OUT_CHANNELS = 64
    r.RES2_OUT_CHANNELS = 256
    r.STRIDE_IN_1X1 = True
    r.STAGE_WITH_DCN = (False, False, False, False)
    r.WITH_MODULATED_DCN = False
    r.DEFORMABLE_GROUPS = 1
    cfg.MODEL.BACKBONE = _CfgNode()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-C4"
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 2
    return cfg


def _randomize_state_dict(sd, rng):
    """Controlled-magnitude weights so a 40-layer frozen-BN stack keeps
    activations O(1) for a meaningful float32 comparison."""
    out = {}
    for k, v in sd.items():
        if k.endswith("running_var"):
            t = 0.5 + rng.rand(*v.shape)
        elif k.endswith("running_mean"):
            t = 0.1 * rng.randn(*v.shape)
        elif ".bn" in k and k.endswith("weight") or "downsample.1.weight" in k:
            t = 1.0 + 0.1 * rng.randn(*v.shape)
        elif k.endswith("bias"):
            t = 0.1 * rng.randn(*v.shape)
        else:  # conv kernels
            fan_in = int(np.prod(v.shape[1:])) if v.dim() > 1 else 1
            t = rng.randn(*v.shape) * (1.5 / np.sqrt(fan_in))
        out[k] = torch.from_numpy(t.astype(np.float32))
    return out


@pytest.fixture(scope="module")
def ref_resnet_c4():
    resnet = ref_module("modeling.backbone.resnet")
    model = resnet.ResNet(_ref_resnet_cfg())
    rng = np.random.RandomState(10)
    model.load_state_dict(_randomize_state_dict(model.state_dict(), rng))
    model.eval()
    return model


def test_resnet_c4_forward_parity_via_state_dict_import(ref_resnet_c4):
    """The full parity loop: reference R-50-C4 body with random weights
    -> state_dict under the real checkpoint key names (backbone.body.*)
    -> import_torch_state_dict -> identical C4 feature maps."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        import_torch_state_dict,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.backbone import (
        ResNetBackbone,
    )

    rng = np.random.RandomState(11)
    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        (ref_c4,) = ref_resnet_c4(torch.from_numpy(x))
    ref_c4 = ref_c4.numpy()

    sd = {
        f"backbone.body.{k}": v.numpy()
        for k, v in ref_resnet_c4.state_dict().items()
    }
    ours = ResNetBackbone(depth="R-50", num_stages=3)
    params = ours.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 96, 3)),
    )
    new_params, report = import_torch_state_dict(params["params"], sd)
    assert not report["missed_source_keys"], report["missed_source_keys"][:5]
    assert not report["unfilled_targets"], report["unfilled_targets"][:5]

    feats = ours.apply(
        {"params": new_params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    ours_c4 = np.asarray(feats[0]).transpose(0, 3, 1, 2)
    assert ours_c4.shape == ref_c4.shape
    scale = max(1.0, np.abs(ref_c4).max())
    np.testing.assert_allclose(
        ours_c4 / scale, ref_c4 / scale, rtol=0, atol=2e-5
    )


def test_resnet_c5_head_parity_and_prestride(ref_resnet_c4):
    """ResNetHead (resnet.py:155-199) vs our ResNetRoIHead, and the
    round-1 prestride optimization: stride-1 C5 on the even-position
    sub-grid must be bit-equivalent to stride-2 C5 on the dense grid."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        import_torch_state_dict,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.resnet import (
        ResNetRoIHead,
    )

    resnet = ref_module("modeling.backbone.resnet")
    stage = resnet.StageSpec(index=4, block_count=3, return_features=False)
    head = resnet.ResNetHead(
        "BottleneckWithFixedBatchNorm",
        (stage,),
        num_groups=1,
        width_per_group=64,
        stride_in_1x1=True,
        stride_init=None,
        res2_out_channels=256,
        dilation=1,
    )
    rng = np.random.RandomState(12)
    head.load_state_dict(_randomize_state_dict(head.state_dict(), rng))
    head.eval()

    x = rng.randn(3, 1024, 14, 14).astype(np.float32)
    with torch.no_grad():
        ref_y = head(torch.from_numpy(x)).numpy()

    sd = {
        f"roi_heads.box.feature_extractor.head.{k}": v.numpy()
        for k, v in head.state_dict().items()
    }
    for prestrided in (False, True):
        ours = ResNetRoIHead(prestrided=prestrided)
        xin = x.transpose(0, 2, 3, 1)
        if prestrided:
            xin = xin[:, ::2, ::2]
        params = ours.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros_like(xin)
        )
        new_params, report = import_torch_state_dict(params["params"], sd)
        assert not report["missed_source_keys"]
        assert not report["unfilled_targets"]
        y = ours.apply({"params": new_params}, jnp.asarray(xin))
        y = np.asarray(y).transpose(0, 3, 1, 2)
        assert y.shape == ref_y.shape
        scale = max(1.0, np.abs(ref_y).max())
        np.testing.assert_allclose(
            y / scale, ref_y / scale, rtol=0, atol=2e-5,
            err_msg=f"prestrided={prestrided}",
        )


# ---------------------------------------------------------------------------
# Mask-target projection (mask_head/loss.py:11-42) — quantified divergence
# ---------------------------------------------------------------------------

def test_mask_target_projection_agreement():
    """Our device-side projection (gt mask rasterized over its box ->
    separable crop-resize onto the proposal) vs the reference CPU path
    (dense image mask -> integer-rounded crop -> bilinear resize ->
    truncating dtype cast).  The conventions differ by design (legacy +1
    box extent vs [round(x1), round(x2)) slicing; 0.5-threshold vs
    truncation), so this test QUANTIFIES the divergence instead of
    asserting bit-equality: mean IoU of the 28x28 targets must stay
    high.  SURVEY 'hard parts' names this the AP-parity risk."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.ops.masks import (
        crop_resize_from_box_frame,
    )

    sm = ref_module("structures.segmentation_mask")
    loss_mod = ref_module("modeling.roi_heads.mask_head.loss")
    BoxList = ref_module("structures.bounding_box").BoxList

    rng = np.random.RandomState(13)
    H, W, M = 160, 200, 28
    ious = []
    for trial in range(20):
        # blobby mask: union of random ellipses inside a gt box
        x1, y1 = rng.randint(5, 60), rng.randint(5, 50)
        bw, bh = rng.randint(40, 100), rng.randint(40, 80)
        x2, y2 = min(x1 + bw, W - 2), min(y1 + bh, H - 2)
        yy, xx = np.mgrid[0:H, 0:W]
        dense = np.zeros((H, W), bool)
        for _ in range(3):
            cx = rng.uniform(x1 + 5, x2 - 5)
            cy = rng.uniform(y1 + 5, y2 - 5)
            rx = rng.uniform(6, (x2 - x1) / 2)
            ry = rng.uniform(6, (y2 - y1) / 2)
            dense |= ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0
        dense &= (xx >= x1) & (xx <= x2) & (yy >= y1) & (yy <= y2)

        # proposal: jittered gt box
        jitter = rng.uniform(-8, 8, 4)
        px1 = np.clip(x1 + jitter[0], 0, W - 10)
        py1 = np.clip(y1 + jitter[1], 0, H - 10)
        px2 = np.clip(x2 + jitter[2], px1 + 10, W - 1)
        py2 = np.clip(y2 + jitter[3], py1 + 10, H - 1)
        proposal = np.array([px1, py1, px2, py2], np.float32)

        # reference target
        seg = sm.SegmentationMask(
            torch.from_numpy(dense[None].astype(np.uint8)), (W, H),
            mode="mask",
        )
        ref_t = loss_mod.project_masks_on_boxes(
            seg, BoxList(torch.from_numpy(proposal[None]), (W, H)), M
        ).numpy()[0]

        # ours: gt-box-frame raster at native resolution (lossless),
        # then the separable crop-resize onto the proposal
        native = dense[y1 : y2 + 1, x1 : x2 + 1].astype(np.float32)
        ours_t = np.asarray(
            crop_resize_from_box_frame(
                jnp.asarray(native),
                jnp.asarray([x1, y1, x2, y2], jnp.float32),
                jnp.asarray(proposal),
                (M, M),
            )
        )
        ours_b = ours_t >= 0.5
        ref_b = ref_t >= 0.5
        inter = (ours_b & ref_b).sum()
        union = max((ours_b | ref_b).sum(), 1)
        ious.append(inter / union)
    mean_iou = float(np.mean(ious))
    assert mean_iou > 0.9, f"mask-target agreement too low: {mean_iou:.3f}"
    assert min(ious) > 0.75, f"worst-case agreement: {min(ious):.3f}"


# ---------------------------------------------------------------------------
# Box-head loss math (modeling/roi_heads/box_head/loss.py:136-212)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cls_agnostic,bg_weight", [(True, 0.2), (False, 1.0)])
def test_box_head_loss_parity(cls_agnostic, bg_weight):
    """Sampling made deterministic (batch cap >= all proposals), then
    the classification (bg-weighted CE / labels.numel()) and regression
    (smooth-L1 / labels.numel()) math must match exactly."""
    from ref_oracle import _CfgNode

    from cvpr22_cross_modal_pseudo_labeling_tpu.models.roi_heads.box_head import (
        SampledRoIs,
        box_head_loss,
    )

    loss_mod = ref_module("modeling.roi_heads.box_head.loss")
    BoxList = ref_module("structures.bounding_box").BoxList
    Matcher = ref_module("modeling.matcher").Matcher
    BoxCoder = ref_module("modeling.box_coder").BoxCoder
    Sampler = ref_module(
        "modeling.balanced_positive_negative_sampler"
    ).BalancedPositiveNegativeSampler

    num_classes, S = 9, 30
    cfg = _CfgNode()
    cfg.MODEL = _CfgNode()
    cfg.MODEL.ROI_BOX_HEAD = _CfgNode()
    cfg.MODEL.ROI_BOX_HEAD.LOSS_WEIGHT_BACKGROUND = bg_weight
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = num_classes

    rng = np.random.RandomState(14)
    img_w, img_h = 320, 280
    props = _rand_boxes(rng, S, img_w, img_h)
    gts = _rand_boxes(rng, 4, img_w, img_h)
    # plant overlaps so some proposals are positives
    props[:4] = gts + rng.uniform(-3, 3, (4, 4)).astype(np.float32)
    gt_labels = rng.randint(1, num_classes, 4)

    evaluator = loss_mod.FastRCNNLossComputation(
        cfg,
        Matcher(0.5, 0.5, allow_low_quality_matches=False),
        Sampler(2 * S, 0.5),  # caps never bind -> deterministic
        BoxCoder(weights=(10.0, 10.0, 5.0, 5.0)),
        cls_agnostic_bbox_reg=cls_agnostic,
    )
    pbl = BoxList(torch.from_numpy(props), (img_w, img_h))
    tbl = BoxList(torch.from_numpy(gts), (img_w, img_h))
    tbl.add_field("labels", torch.from_numpy(gt_labels.astype(np.int64)))
    (sampled_bl,) = evaluator.subsample([pbl], [tbl])
    n_s = len(sampled_bl)
    assert n_s == S  # nothing dropped

    n_reg = 2 if cls_agnostic else num_classes
    logits = (rng.randn(n_s, num_classes) * 2).astype(np.float32)
    deltas = (rng.randn(n_s, n_reg * 4) * 0.4).astype(np.float32)
    ref_cls, ref_box = evaluator(
        [torch.from_numpy(logits)], [torch.from_numpy(deltas)], None
    )

    # our loss over the reference's own sampled rois (identical inputs)
    labels = sampled_bl.get_field("labels").numpy().astype(np.int32)
    reg_t = sampled_bl.get_field("regression_targets").numpy()
    sampled = SampledRoIs(
        boxes=jnp.asarray(sampled_bl.bbox.numpy())[None],
        labels=jnp.asarray(labels)[None],
        reg_targets=jnp.asarray(reg_t)[None],
        valid=jnp.ones((1, n_s), bool),
        is_pos=jnp.asarray(labels > 0)[None],
        matched_gt=jnp.zeros((1, n_s), jnp.int32),
    )
    ours_cls, ours_box = box_head_loss(
        jnp.asarray(logits),
        jnp.asarray(deltas),
        sampled,
        bg_weight=bg_weight,
        cls_agnostic_bbox_reg=cls_agnostic,
    )
    np.testing.assert_allclose(float(ours_cls), float(ref_cls), rtol=1e-5)
    np.testing.assert_allclose(float(ours_box), float(ref_box), rtol=1e-5)


def test_keypoints_to_heat_map_parity():
    """Discretization parity with structures/keypoint.py:154 — incl. the
    exact-edge snap (original coordinate == box edge) and the
    just-outside case that must stay invalid."""
    kp_mod = ref_module("structures.keypoint")

    from cvpr22_cross_modal_pseudo_labeling_tpu.models.roi_heads.keypoint_head import (
        keypoints_to_heatmap_targets,
    )

    rng = np.random.RandomState(0)
    S, K, H = 6, 17, 14
    rois = np.stack(
        [
            rng.uniform(0, 40, S),
            rng.uniform(0, 40, S),
            rng.uniform(60, 120, S),
            rng.uniform(60, 120, S),
        ],
        axis=1,
    ).astype(np.float32)
    kps = np.stack(
        [
            rng.uniform(-10, 130, (S, K)),
            rng.uniform(-10, 130, (S, K)),
            rng.randint(0, 3, (S, K)).astype(np.float64),
        ],
        axis=-1,
    ).astype(np.float32)
    # force the edge cases: exactly-on-edge and just-outside
    kps[0, 0, :2] = (rois[0, 2], rois[0, 3])  # exact edge -> snap, valid
    kps[0, 1, 0] = rois[0, 2] + 1e-3          # just outside -> invalid
    kps[0, :2, 2] = 2

    ref_maps, ref_valid = kp_mod.keypoints_to_heat_map(
        torch.from_numpy(kps), torch.from_numpy(rois), H
    )
    targets, valid = keypoints_to_heatmap_targets(
        jnp.asarray(kps), jnp.asarray(rois), H
    )
    np.testing.assert_array_equal(
        np.asarray(valid), ref_valid.numpy().astype(bool)
    )
    v = ref_valid.numpy().astype(bool)
    np.testing.assert_array_equal(
        np.asarray(targets)[v], ref_maps.numpy()[v]
    )


def test_wsddn_head_and_loss_parity():
    """WSDDN two-stream predictor + image-level BCE vs the reference
    modules (wsddn_head/roi_box_predictors.py:5-28, loss.py:13-31) with
    transplanted linear weights: per-proposal combined scores (ours in
    prob space == exp of the reference's combined log scores) and the
    weighted multi-label loss must match."""
    pred_mod = ref_module("modeling.roi_heads.wsddn_head.roi_box_predictors")
    loss_mod = ref_module("modeling.roi_heads.wsddn_head.loss")
    from ref_oracle import _CfgNode

    from cvpr22_cross_modal_pseudo_labeling_tpu.models.roi_heads.wsddn_head import (
        WSDDNHead,
        wsddn_loss,
    )

    C, D, B, S = 5, 32, 2, 7
    cfg = _CfgNode()
    cfg.MODEL = _CfgNode()
    cfg.MODEL.ROI_BOX_HEAD = _CfgNode()
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = C
    cfg.MODEL.ROI_BOX_HEAD.LOSS_WEIGHT_BACKGROUND = 0.3

    torch.manual_seed(0)
    ref_pred = pred_mod.WSDDNPredictor(cfg, D)
    ref_loss = loss_mod.WSDDNLossComputation(cfg)

    rng = np.random.RandomState(1)
    feats = rng.randn(B * S, D, 1, 1).astype(np.float32)
    labels = (rng.rand(B, C) < 0.4).astype(np.float32)

    with torch.no_grad():
        combined_log = ref_pred(
            torch.from_numpy(feats), [S, S]
        )  # [B*S, C] log scores
        ref_l = ref_loss(
            combined_log, torch.from_numpy(labels), [S, S]
        )

    head = WSDDNHead(num_classes=C)
    pooled = jnp.asarray(feats.reshape(B, S, D))
    valid = jnp.ones((B, S), bool)
    params = {
        "params": {
            "cls_score": {
                "kernel": jnp.asarray(
                    ref_pred.cls_score.weight.detach().numpy().T
                ),
                "bias": jnp.asarray(
                    ref_pred.cls_score.bias.detach().numpy()
                ),
            },
            "det_score": {
                "kernel": jnp.asarray(
                    ref_pred.det_score.weight.detach().numpy().T
                ),
                "bias": jnp.asarray(
                    ref_pred.det_score.bias.detach().numpy()
                ),
            },
        }
    }
    proposal_scores, image_scores = head.apply(params, pooled, valid)
    np.testing.assert_allclose(
        np.asarray(proposal_scores).reshape(B * S, C),
        np.exp(combined_log.numpy()),
        rtol=0,
        atol=1e-5,
    )
    ours_l = wsddn_loss(
        image_scores, jnp.asarray(labels), background_weight=0.3
    )
    np.testing.assert_allclose(float(ours_l), float(ref_l), rtol=2e-5)


def test_rpn_postprocessor_multilevel_fpn_parity():
    """Multi-level selection vs the reference RPNPostProcessor
    (rpn/inference.py:125-181): per-level top-k/NMS then the FPN
    cross-level top-N — eval's per-image sort and training's
    per-batch Detectron-quirk mask (Issue #672)."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.rpn.anchors import (
        build_anchors_for_levels,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.rpn.rpn import (
        select_proposals_multi_level,
    )

    rpn_inf = ref_module("modeling.rpn.inference")
    ag = ref_module("modeling.rpn.anchor_generator")
    ImageList = ref_module("structures.image_list").ImageList
    BoxCoder = ref_module("modeling.box_coder").BoxCoder

    strides = (8, 16, 32)
    sizes = (64, 128, 256)
    ratios = (0.5, 1.0, 2.0)
    A = len(ratios)
    shapes = [(40, 34), (20, 17), (10, 9)]
    img_sizes = [(320, 272), (300, 250)]
    B = len(img_sizes)
    rng = np.random.RandomState(11)
    objs = [rng.randn(B, A, h, w).astype(np.float32) for h, w in shapes]
    regs = [
        (rng.randn(B, A * 4, h, w) * 0.4).astype(np.float32)
        for h, w in shapes
    ]

    gen = ag.AnchorGenerator(
        sizes=tuple((s,) for s in sizes), aspect_ratios=ratios,
        anchor_strides=strides, straddle_thresh=0,
    )
    il = ImageList(
        torch.zeros(B, 3, 320, 272), [(hh, ww) for hh, ww in img_sizes]
    )
    anchors_per_img = gen(
        il, [torch.zeros(B, 1, h, w) for h, w in shapes]
    )

    anchor_list = build_anchors_for_levels(shapes, strides, sizes, ratios)
    obj_flat = np.concatenate(
        [o.transpose(0, 2, 3, 1).reshape(B, -1) for o in objs], axis=1
    )
    reg_flat = np.concatenate(
        [
            r.reshape(B, A, 4, h, w).transpose(0, 3, 4, 1, 2).reshape(B, -1, 4)
            for r, (h, w) in zip(regs, shapes)
        ],
        axis=1,
    )

    def run_ref(train, per_batch):
        post = rpn_inf.RPNPostProcessor(
            pre_nms_top_n=100, post_nms_top_n=30, nms_thresh=0.7, min_size=0,
            box_coder=BoxCoder(weights=(1.0, 1.0, 1.0, 1.0)),
            fpn_post_nms_top_n=40, fpn_post_nms_per_batch=per_batch,
        )
        post.train(train)
        return post(
            anchors_per_img,
            [torch.from_numpy(o) for o in objs],
            [torch.from_numpy(r) for r in regs],
        )

    def run_ours(per_batch):
        return select_proposals_multi_level(
            anchor_list,
            jnp.asarray(obj_flat),
            jnp.asarray(reg_flat),
            jnp.asarray(img_sizes, jnp.int32),
            100, 30, 0.7, 0.0, nms_tile=64,
            fpn_post_nms_top_n=40, fpn_post_nms_per_batch=per_batch,
        )

    # eval: per-image FPN top-N, descending objectness order
    ref_out = run_ref(train=False, per_batch=False)
    props = run_ours(per_batch=False)
    for bi in range(B):
        ref_boxes = ref_out[bi].bbox.numpy()
        ref_scores = ref_out[bi].get_field("objectness").numpy()
        n = len(ref_boxes)
        assert int(np.asarray(props.valid[bi]).sum()) == n
        np.testing.assert_allclose(
            np.asarray(props.boxes[bi])[:n], ref_boxes, rtol=1e-4, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(props.scores[bi])[:n], ref_scores, rtol=1e-5, atol=1e-5
        )

    # train: per-batch top-N over the whole batch's objectness; the
    # reference keeps concat order, ours sorts — compare per-image sets
    ref_out = run_ref(train=True, per_batch=True)
    props = run_ours(per_batch=True)
    for bi in range(B):
        ref_scores = np.sort(
            ref_out[bi].get_field("objectness").numpy()
        )[::-1]
        valid = np.asarray(props.valid[bi])
        got = np.sort(np.asarray(props.scores[bi])[valid])[::-1]
        assert len(got) == len(ref_scores)
        np.testing.assert_allclose(got, ref_scores, rtol=1e-5, atol=1e-5)
        ref_boxes = ref_out[bi].bbox.numpy()
        order_ref = np.argsort(
            -ref_out[bi].get_field("objectness").numpy(), kind="stable"
        )
        ours_boxes = np.asarray(props.boxes[bi])[valid]
        np.testing.assert_allclose(
            ours_boxes, ref_boxes[order_ref], rtol=1e-4, atol=2e-3
        )
