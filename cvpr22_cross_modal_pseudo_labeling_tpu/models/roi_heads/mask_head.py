"""Mask head: C4 predictor with uncertainty, loss, postprocessing.

Re-design of reference modeling/roi_heads/mask_head/:
  * predictor — MaskRCNNC4Predictor (roi_mask_predictors.py:10-65):
    ConvTranspose 2x2/2 -> relu -> 1x1 logits (2 channels when
    cls-agnostic); optional uncertainty 1x1 conv on detached features,
    sigma = exp(0.5 x), reparameterized logit sampling in training.
  * loss — BCE-with-logits mean over positive rois
    (mask_head/loss.py:45-164); targets produced on device by
    ops.masks.project_masks_on_boxes instead of the reference's per-box
    CPU loop ("FIXME: CPU computation bottleneck", loss.py:31).
  * inference — per-detection sigmoid + class-channel select
    (mask_head/inference.py:12-94).
"""

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.losses import binary_cross_entropy_with_logits
from ...ops.masks import project_masks_on_boxes
from .box_head import SampledRoIs


class MaskPredictor(nn.Module):
    """MaskRCNNC4Predictor; input NHWC [N, H, W, C_in]."""

    num_classes: int  # 2 when cls-agnostic
    dim_reduced: int = 256
    uncertainty: bool = False
    # upper bound on the predicted sigma; 0.0 = unbounded (reference
    # parity — safe under "sampled_bce", whose Jensen pressure shrinks
    # sigma).  "logmeanexp" REWARDS sigma at contradicted pixels, and
    # under heavy label noise unbounded sigma runs away until the mask
    # head stops learning (tools/ablate_st_e2e.py) — cap it.
    sigma_max: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        compute_uncertain: bool = False,
        train: bool = False,
        num_samples: int = 1,
    ):
        up = nn.ConvTranspose(
            self.dim_reduced,
            (2, 2),
            strides=(2, 2),
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"
            ),
            dtype=self.dtype,
            name="conv5_mask",
        )(x)
        up = nn.relu(up)
        logits = nn.Conv(
            self.num_classes,
            (1, 1),
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"
            ),
            dtype=self.dtype,
            name="mask_fcn_logits",
        )(up)  # [N, 2H, 2W, num_classes]

        if not (self.uncertainty and compute_uncertain):
            return logits, None

        scale_logit = nn.Conv(
            1,
            (1, 1),
            kernel_init=nn.initializers.normal(0.001),
            bias_init=nn.initializers.ones,
            dtype=self.dtype,
            name="uncertain_pred",
        )(jax.lax.stop_gradient(up))
        # clamp the log-variance: exp is the identity map the reference
        # uses (roi_mask_predictors.py:43-48) but unclamped it overflows
        # to inf under divergence and NaNs the whole step; +-30 is far
        # outside any healthy sigma and changes nothing numerically
        hi = 2.0 * jnp.log(self.sigma_max) if self.sigma_max > 0 else 30.0
        scale = jnp.exp(0.5 * jnp.clip(scale_logit, -30.0, hi))

        if train:
            eps = jax.random.normal(
                self.make_rng("uncertainty"),
                (num_samples,) + logits.shape,
                logits.dtype,
            )
            logits = logits[None] + eps * scale[None]  # [n_s, N, ...]
        return logits, scale


class MaskLossInputs(NamedTuple):
    mask_logits: jnp.ndarray  # [B*S, M, M, C] or [n_s, B*S, M, M, C]
    scale: Optional[jnp.ndarray]


def mask_head_loss(
    mask_logits: jnp.ndarray,
    sampled: SampledRoIs,
    gt_masks: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    cls_agnostic_mask: bool = True,
    loss_weight: Optional[jnp.ndarray] = None,
    estimator: str = "sampled_bce",
) -> jnp.ndarray:
    """mask_logits [B*S, M, M, C] (or with a leading samples dim);
    gt_masks [B, G, Mr, Mr] rasterized over gt_boxes [B, G, 4].

    Returns scalar BCE mean over positive-roi mask pixels
    (mask_head/loss.py:125-143).  The sample dim of reparameterized
    logits collapses per ``estimator``:

    * ``"sampled_bce"`` — mean over samples (the reference's
      repeat_factor flattening, loss.py:117-123).  Jensen: this bounds
      the deterministic BCE from below only at sigma=0, so training
      pressure on sigma is monotone DOWN.
    * ``"logmeanexp"`` — Kendall & Gal loss attenuation,
      -log((1/n_s) sum_t exp(-bce_t)) per pixel: one lucky sample
      caps the loss of a confidently-contradicted pixel, so sigma is
      rewarded exactly where the target disagrees with a confident
      prediction.  Equal to "sampled_bce" when n_s == 1.
    """
    has_samples = mask_logits.ndim == 5
    if not has_samples:
        mask_logits = mask_logits[None]
    n_s, n, m, _, c = mask_logits.shape
    b, s = sampled.labels.shape

    def per_image(gm, gb, boxes, matched):
        return project_masks_on_boxes(gm, gb, boxes, matched, m)

    targets = jax.vmap(per_image)(
        gt_masks, gt_boxes, sampled.boxes, sampled.matched_gt
    )  # [B, S, M, M]
    targets = targets.reshape(n, m, m)
    # binarize: rasterized masks are floats in [0,1]
    targets = (targets >= 0.5).astype(mask_logits.dtype)

    if cls_agnostic_mask:
        sel = jnp.ones((n,), jnp.int32)  # labels collapse to 1 (loss.py:131)
    else:
        sel = jnp.clip(sampled.labels.reshape(-1), 0)
    logits_sel = jnp.take_along_axis(
        mask_logits, sel[None, :, None, None, None], axis=-1
    )[..., 0]  # [n_s, N, M, M]

    pos = (sampled.is_pos & sampled.valid).reshape(-1)
    per_pix = binary_cross_entropy_with_logits(
        logits_sel, targets[None]
    )  # [n_s, N, M, M]
    if estimator == "logmeanexp" and n_s > 1:
        # attenuated per-pixel loss over the sample dim; keeps a
        # (degenerate) leading axis so the weighting below is shared
        per_pix = -(
            jax.nn.logsumexp(-per_pix, axis=0, keepdims=True)
            - jnp.log(float(n_s))
        )
        n_s = 1
    elif estimator not in ("sampled_bce", "logmeanexp"):
        raise ValueError(f"unknown mask uncertainty estimator {estimator!r}")
    w = pos.astype(per_pix.dtype)[None, :, None, None]
    if loss_weight is not None:
        w = w * loss_weight.reshape(-1)[None, :, None, None]
    # mean over all positive pixels and samples:
    denom = jnp.maximum(
        jnp.sum(pos.astype(per_pix.dtype)) * n_s * m * m, 1.0
    )
    return jnp.sum(per_pix * w) / denom


def mask_head_inference(
    mask_logits: jnp.ndarray,
    det_labels: jnp.ndarray,
    cls_agnostic_mask: bool = True,
) -> jnp.ndarray:
    """mask_logits [N, M, M, C] -> per-detection probabilities [N, M, M]
    (mask_head/inference.py:12-94: sigmoid, select class channel; channel
    1 when cls-agnostic)."""
    probs = jax.nn.sigmoid(mask_logits)
    if cls_agnostic_mask:
        return probs[..., 1]
    sel = jnp.clip(det_labels, 0, mask_logits.shape[-1] - 1)
    return jnp.take_along_axis(
        probs, sel[:, None, None, None], axis=-1
    )[..., 0]
