"""Region Proposal Network: head, loss, and proposal selection.

TPU re-design of reference modeling/rpn/{rpn,loss,inference}.py:
  * head — SingleConvRPNHead (rpn.py:73-106), NHWC.
  * loss — matcher 0.7/0.3 with low-quality recovery, 256 anchors/image
    at 0.5 positive fraction, BCE objectness + smooth-L1 (beta=1/9)
    normalized by total sampled (loss.py:21-157).  Sampling is
    mask-based: no gathers, the losses are masked reductions.
  * proposal selection — per-level top-k, decode, clip, min-size filter,
    NMS, per-image top post_nms_n (inference.py:76-152).  The reference's
    per-image Python loop becomes vmap; everything is static-shape.
"""

from typing import Any, List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.box_coder import decode_boxes, encode_boxes
from ...core.boxes import clip_to_image, nonempty_mask
from ...core.matcher import match_boxes
from ...core.sampler import balanced_sample_masks
from ...ops.losses import binary_cross_entropy_with_logits, smooth_l1_loss
from ...ops.nms import nms


class RPNHead(nn.Module):
    """SingleConvRPNHead (rpn.py:73-106): shared 3x3 conv + 1x1 cls /
    1x1 reg heads, applied to each FPN level."""

    in_channels: int
    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        conv = nn.Conv(
            self.in_channels, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.normal(0.01), dtype=self.dtype,
            name="conv",
        )
        cls_logits = nn.Conv(
            self.num_anchors, (1, 1),
            kernel_init=nn.initializers.normal(0.01), dtype=self.dtype,
            name="cls_logits",
        )
        bbox_pred = nn.Conv(
            self.num_anchors * 4, (1, 1),
            kernel_init=nn.initializers.normal(0.01), dtype=self.dtype,
            name="bbox_pred",
        )
        objectness, box_reg = [], []
        for f in features:
            t = nn.relu(conv(f))
            objectness.append(cls_logits(t))
            box_reg.append(bbox_pred(t))
        return objectness, box_reg


def flatten_rpn_outputs(objectness, box_regression):
    """[B,H,W,A] / [B,H,W,4A] per level -> concatenated [B,N] / [B,N,4]
    in (level, y, x, a) order — the same order as the anchor arrays."""
    b = objectness[0].shape[0]
    objs = [o.reshape(b, -1) for o in objectness]
    regs = [r.reshape(b, -1, 4) for r in box_regression]
    return jnp.concatenate(objs, axis=1), jnp.concatenate(regs, axis=1)


class RPNProposals(NamedTuple):
    boxes: jnp.ndarray  # [B, P, 4]
    scores: jnp.ndarray  # [B, P] objectness (sigmoid at selection score)
    valid: jnp.ndarray  # [B, P] bool


def select_proposals_single_level(
    anchors: jnp.ndarray,
    objectness: jnp.ndarray,
    box_regression: jnp.ndarray,
    image_sizes: jnp.ndarray,
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    min_size: float,
    nms_tile: int = 256,
) -> RPNProposals:
    """One level's proposal selection, batched over images.

    anchors [N,4]; objectness [B,N] raw logits; box_regression [B,N,4].
    """
    n = anchors.shape[0]
    k = min(pre_nms_top_n, n)

    def per_image(obj, reg, img_size):
        topv, topi = jax.lax.top_k(obj, k)
        sel_anchors = anchors[topi]
        sel_reg = reg[topi]
        boxes = decode_boxes(sel_reg, sel_anchors, (1.0, 1.0, 1.0, 1.0))
        boxes = clip_to_image(boxes, img_size)
        keep = nonempty_mask(boxes, min_size)
        scores = jax.nn.sigmoid(topv)
        idx, keep_valid = nms(
            boxes, scores, keep, nms_thresh, post_nms_top_n, nms_tile
        )
        return RPNProposals(
            boxes=boxes[idx], scores=scores[idx], valid=keep_valid
        )

    out = jax.vmap(per_image)(objectness, box_regression, image_sizes)
    # Proposal selection runs under no_grad in the reference
    # (rpn/inference.py forward wraps box selection in torch.no_grad());
    # cutting the gradient here also keeps decode/NMS out of autodiff.
    return jax.tree_util.tree_map(jax.lax.stop_gradient, out)


def select_proposals_multi_level(
    anchor_list,
    objectness: jnp.ndarray,
    box_regression: jnp.ndarray,
    image_sizes: jnp.ndarray,
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    min_size: float,
    nms_tile: int = 256,
    fpn_post_nms_top_n: int = 0,
    fpn_post_nms_per_batch: bool = False,
    per_batch_groups: int = 1,
) -> RPNProposals:
    """Reference rpn/inference.py:76-181 semantics for any number of
    feature levels: per-level top-k -> decode -> NMS -> per-level
    post_nms_top_n, then an FPN top-N by objectness over the
    concatenated levels using ``fpn_post_nms_top_n`` (defaults to
    post_nms_top_n like the reference's None fallback, inference.py:
    48-49).  With one level this IS select_proposals_single_level
    (C4/C5 path).

    ``fpn_post_nms_per_batch`` reproduces the Detectron quirk
    (inference.py:156-171 + Issue #672): in training the top-N is over
    the whole batch's concatenated objectness, not per image — here a
    batch-global top-N scatter mask over the flattened scores (same
    lowest-index tie-breaking as ``torch.topk``), with the padded
    per-image layout kept and validity masking the cut.

    ``per_batch_groups`` reproduces the reference's *granularity*: the
    reference runs per GPU, so its "whole batch" is the local
    IMS_PER_BATCH/num_gpus minibatch.  Under SPMD the in-step batch is
    global; splitting it into ``per_batch_groups`` contiguous groups
    (one per data shard) and taking top-N per group matches the
    reference's per-GPU selection, and keeps the top_k local to each
    data shard (no cross-device gather).  1 = single-process semantics.

    ``anchor_list`` is the per-level [N_l, 4] anchors whose
    concatenation ordering matches ``objectness`` [B, sum(N_l)] /
    ``box_regression`` [B, sum(N_l), 4] (flatten_rpn_outputs order).
    """
    if len(anchor_list) == 1:
        return select_proposals_single_level(
            anchor_list[0], objectness, box_regression, image_sizes,
            pre_nms_top_n, post_nms_top_n, nms_thresh, min_size, nms_tile,
        )
    fpn_top_n = fpn_post_nms_top_n or post_nms_top_n
    offset = 0
    parts = []
    for lvl_anchors in anchor_list:
        n = lvl_anchors.shape[0]
        parts.append(
            select_proposals_single_level(
                lvl_anchors,
                objectness[:, offset : offset + n],
                box_regression[:, offset : offset + n],
                image_sizes,
                pre_nms_top_n, post_nms_top_n,
                nms_thresh, min_size, nms_tile,
            )
        )
        offset += n
    boxes = jnp.concatenate([p.boxes for p in parts], axis=1)
    scores = jnp.concatenate([p.scores for p in parts], axis=1)
    valid = jnp.concatenate([p.valid for p in parts], axis=1)
    keyed = jnp.where(valid, scores, -jnp.inf)
    k = min(fpn_top_n, boxes.shape[1])
    if fpn_post_nms_per_batch:
        # per-group top-N scatter mask (inference.py:162-171; group =
        # the reference's per-GPU minibatch).  Partial trailing batches
        # (DATALOADER.DROP_LAST False flushes leftovers every epoch)
        # fall back to the coarsest compatible grouping instead of
        # failing: gcd keeps the full-batch case exactly per-shard and
        # degrades gracefully on stragglers (the reference's equivalent
        # — a short last batch unevenly split across GPUs — has no
        # well-defined grouping either).
        import math

        b, p = keyed.shape
        g = math.gcd(b, max(per_batch_groups, 1))
        if g != max(per_batch_groups, 1):
            # shapes are static, so this fires once per trace, not per
            # step — a visible signal that the grouping degraded (a
            # trailing partial batch is expected; anything else likely
            # means a misconfigured group count)
            from ...utils.logger import get_logger

            get_logger("rpn").warning(
                "FPN_POST_NMS_PER_BATCH: batch %d not divisible by "
                "%d groups; falling back to gcd grouping g=%d",
                b, per_batch_groups, g,
            )
        flat = keyed.reshape(g, (b // g) * p)
        n_keep = min(fpn_top_n, flat.shape[1])
        _, flat_idx = jax.lax.top_k(flat, n_keep)
        keep = jnp.zeros(flat.shape, bool)
        keep = keep.at[jnp.arange(g)[:, None], flat_idx].set(True)
        keyed = jnp.where(keep.reshape(b, p), keyed, -jnp.inf)
    _, idx = jax.lax.top_k(keyed, k)

    def take(a):
        return jnp.take_along_axis(
            a, idx[..., None] if a.ndim == 3 else idx, axis=1
        )

    out_valid = take(valid)
    if fpn_post_nms_per_batch:
        out_valid = out_valid & (
            jnp.take_along_axis(keyed, idx, axis=1) > -jnp.inf
        )
    return RPNProposals(take(boxes), take(scores), out_valid)


def rpn_loss(
    anchors: jnp.ndarray,
    visibility: jnp.ndarray,
    objectness: jnp.ndarray,
    box_regression: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    key: jax.Array,
    fg_iou_threshold: float = 0.7,
    bg_iou_threshold: float = 0.3,
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched RPN losses (loss.py:92-157).

    anchors [N,4]; visibility [B,N]; objectness [B,N]; box_regression
    [B,N,4]; gt_boxes [B,G,4]; gt_valid [B,G].
    Returns (objectness_loss, box_loss) scalars.
    """
    from ...core.boxes import box_iou

    b = objectness.shape[0]
    keys = jax.random.split(key, b)

    def per_image(obj, reg, gts, gtv, vis, k):
        quality = box_iou(gts, anchors)  # [G, N]
        matched = match_boxes(
            quality, gtv, fg_iou_threshold, bg_iou_threshold,
            allow_low_quality_matches=True,
        )
        pos = matched >= 0
        neg = matched == -1  # BELOW_LOW
        # discard invisible anchors (loss.py discard_anchors)
        pos = pos & vis
        neg = neg & vis
        spos, sneg = balanced_sample_masks(
            pos, neg, k, batch_size_per_image, positive_fraction
        )
        sampled = spos | sneg
        labels = pos.astype(jnp.float32)

        reg_targets = encode_boxes(
            gts[jnp.clip(matched, 0)], anchors, (1.0, 1.0, 1.0, 1.0)
        )

        obj_loss_sum = jnp.sum(
            binary_cross_entropy_with_logits(obj, labels)
            * sampled.astype(obj.dtype)
        )
        box_loss_sum = jnp.sum(
            smooth_l1_loss(reg, reg_targets, beta=1.0 / 9)
            * spos.astype(reg.dtype)[:, None]
        )
        n_sampled = jnp.sum(sampled.astype(jnp.float32))
        return obj_loss_sum, box_loss_sum, n_sampled

    obj_sums, box_sums, counts = jax.vmap(per_image)(
        objectness, box_regression, gt_boxes, gt_valid, visibility, keys
    )
    total = jnp.maximum(jnp.sum(counts), 1.0)
    # reference: objectness mean over sampled; box sum / #sampled
    return jnp.sum(obj_sums) / total, jnp.sum(box_sums) / total
