"""RetinaNet loss + inference parity against the reference's pure-torch
modules (modeling/rpn/retinanet/{loss,inference}.py) on identical
anchors/logits/regressions — extends the oracle suite to the RetinaNet
family.  These oracles exposed three real bugs in our loss: regression
targets encoded with unit coder weights while inference decoded with
(10, 10, 5, 5), and both loss normalizations (cls /(pos+images), reg
/(pos*regress_norm)) diverging from the reference.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_oracle import ref_module

B = 2
LEVELS = [(6, 8), (3, 4)]  # H, W per level
STRIDES = (16, 32)
A = 9  # 3 ratios x 3 scales
NUM_CLASSES = 5  # incl. background
FG = NUM_CLASSES - 1


def _our_anchors():
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.rpn.anchors import (
        build_anchors_for_levels,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.models.rpn.retinanet import (
        RetinaNetStatics,
        retinanet_anchor_sizes,
    )

    s = RetinaNetStatics(
        num_classes=NUM_CLASSES,
        anchor_sizes=(32, 64),
        anchor_strides=STRIDES,
    )
    return (
        build_anchors_for_levels(
            LEVELS, s.anchor_strides, retinanet_anchor_sizes(s),
            s.aspect_ratios,
        ),
        s,
    )


def _rand_inputs(seed=0):
    rng = np.random.RandomState(seed)
    n_total = sum(h * w * A for h, w in LEVELS)
    logits = rng.randn(B, n_total, FG).astype(np.float32) - 2.0
    reg = (0.3 * rng.randn(B, n_total, 4)).astype(np.float32)
    gt_boxes = np.stack(
        [
            np.array([[10, 10, 60, 50], [30, 20, 90, 80], [5, 40, 40, 90]]),
            np.array([[20, 15, 70, 60], [50, 30, 110, 85], [0, 0, 1, 1]]),
        ]
    ).astype(np.float32)
    gt_labels = np.array([[1, 2, 4], [3, 1, 1]], np.int64)
    gt_valid = np.array([[True, True, True], [True, True, False]])
    return logits, reg, gt_boxes, gt_labels, gt_valid


def _to_ref_level_tensors(flat, channels):
    """Our flat (H, W, A)-ordered [B, N, c] arrays -> the reference's
    per-level NCHW tensors with channel index a*c + ci (the inverse of
    permute_and_flatten, rpn/utils.py)."""
    out = []
    off = 0
    for h, w in LEVELS:
        n = h * w * A
        part = flat[:, off : off + n].reshape(B, h, w, A, channels)
        out.append(
            torch.from_numpy(
                np.ascontiguousarray(
                    part.transpose(0, 3, 4, 1, 2).reshape(
                        B, A * channels, h, w
                    )
                )
            )
        )
        off += n
    return out


@pytest.fixture(scope="module")
def ref_mods():
    loss_mod = ref_module(
        "modeling.rpn.retinanet.loss", with_transformers_shim=True
    )
    inf_mod = ref_module("modeling.rpn.retinanet.inference")
    bb = ref_module("structures.bounding_box")
    coder_mod = ref_module("modeling.box_coder")
    return loss_mod, inf_mod, bb.BoxList, coder_mod.BoxCoder


def test_retinanet_loss_parity(ref_mods):
    loss_mod, _, BoxList, BoxCoder = ref_mods
    from maskrcnn_benchmark.layers import SigmoidFocalLoss
    from maskrcnn_benchmark.modeling.matcher import Matcher

    from cvpr22_cross_modal_pseudo_labeling_tpu.models.rpn.retinanet import (
        retinanet_loss,
    )

    anchor_list, s = _our_anchors()
    anchors_np = np.concatenate([np.asarray(a) for a in anchor_list])
    logits, reg, gt_boxes, gt_labels, gt_valid = _rand_inputs()

    evaluator = loss_mod.RetinaNetLossComputation(
        Matcher(s.fg_iou, s.bg_iou, allow_low_quality_matches=True),
        BoxCoder(weights=(10.0, 10.0, 5.0, 5.0)),
        loss_mod.generate_retinanet_labels,
        SigmoidFocalLoss(s.loss_gamma, s.loss_alpha),
        bbox_reg_beta=s.bbox_reg_beta,
        regress_norm=s.bbox_reg_weight,
    )
    size = (128, 96)  # (w, h)
    ref_anchors = [
        [
            BoxList(torch.from_numpy(np.asarray(a)), size)
            for a in anchor_list
        ]
        for _ in range(B)
    ]
    targets = []
    for bi in range(B):
        keep = gt_valid[bi]
        t = BoxList(torch.from_numpy(gt_boxes[bi][keep]), size)
        t.add_field("labels", torch.from_numpy(gt_labels[bi][keep]))
        targets.append(t)
    with torch.no_grad():
        ref_cls, ref_reg = evaluator(
            ref_anchors,
            _to_ref_level_tensors(logits, FG),
            _to_ref_level_tensors(reg, 4),
            targets,
        )

    our_cls, our_reg = retinanet_loss(
        jnp.asarray(anchors_np),
        jnp.asarray(logits),
        jnp.asarray(reg),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels.astype(np.int32)),
        jnp.asarray(gt_valid),
        s,
    )
    np.testing.assert_allclose(
        float(our_cls), float(ref_cls), rtol=2e-5, err_msg="cls"
    )
    np.testing.assert_allclose(
        float(our_reg), float(ref_reg), rtol=2e-5, err_msg="reg"
    )


def test_retinanet_inference_parity(ref_mods):
    _, inf_mod, BoxList, BoxCoder = ref_mods
    from test_e2e_reference_parity import _greedy_match

    from cvpr22_cross_modal_pseudo_labeling_tpu.models.rpn.retinanet import (
        retinanet_inference,
    )

    anchor_list, s = _our_anchors()
    s = s._replace(pre_nms_top_n=50, detections_per_img=20)
    logits, reg, _, _, _ = _rand_inputs(seed=3)

    post = inf_mod.RetinaNetPostProcessor(
        pre_nms_thresh=s.inference_th,
        pre_nms_top_n=s.pre_nms_top_n,
        nms_thresh=s.nms_th,
        fpn_post_nms_top_n=s.detections_per_img,
        min_size=0,
        num_classes=NUM_CLASSES,
        box_coder=BoxCoder(weights=(10.0, 10.0, 5.0, 5.0)),
    )
    size = (128, 96)
    ref_anchors = [
        [
            BoxList(torch.from_numpy(np.asarray(a)), size)
            for a in anchor_list
        ]
        for _ in range(B)
    ]
    with torch.no_grad():
        ref_out = post.forward(
            ref_anchors,
            _to_ref_level_tensors(logits, FG),
            _to_ref_level_tensors(reg, 4),
        )

    # ours consumes per-level NHWC maps
    our_logits, our_reg, off = [], [], 0
    for h, w in LEVELS:
        n = h * w * A
        our_logits.append(
            jnp.asarray(logits[:, off : off + n].reshape(B, h, w, A * FG))
        )
        our_reg.append(
            jnp.asarray(reg[:, off : off + n].reshape(B, h, w, A * 4))
        )
        off += n
    dets = retinanet_inference(
        [jnp.asarray(np.asarray(a)) for a in anchor_list],
        our_logits,
        our_reg,
        jnp.array([[96, 128]] * B, jnp.int32),
        s,
        nms_tile=64,
    )

    for bi in range(B):
        rb = ref_out[bi].bbox.numpy()
        rs = ref_out[bi].get_field("scores").numpy()
        rl = ref_out[bi].get_field("labels").numpy()
        valid = np.asarray(dets.valid[bi])
        ob = np.asarray(dets.boxes[bi])[valid]
        osc = np.asarray(dets.scores[bi])[valid]
        ol = np.asarray(dets.labels[bi])[valid]
        assert len(rb) > 2, "degenerate oracle"
        pairs = _greedy_match(rb, rl, ob, ol, iou_thresh=0.9)
        assert len(pairs) / len(rb) >= 0.9, (bi, len(pairs), len(rb))
        sd = max(abs(rs[r] - osc[o]) for r, o in pairs)
        assert sd < 1e-3, sd
