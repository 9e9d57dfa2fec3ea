"""MODEL.ROI_MASK_HEAD.UNCERTAINTY_ESTIMATOR — the reparameterized
mask-loss sample-collapse rule.

The reference hardcodes n_samples=1 mean sampled-BCE
(roi_mask_predictors.py:47, mask_head/loss.py:117-123).  This repo
additionally ships the Kendall-Gal "logmeanexp" attenuation as a
config knob (identical at 1 sample); tools/ablate_st.py measures what
each estimator's learned sigma actually does.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr22_cross_modal_pseudo_labeling_tpu.models.roi_heads.mask_head import (
    mask_head_loss,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.models.roi_heads.box_head import (
    SampledRoIs,
)


def _inputs(n_s, b=1, s=4, m=14, g=3, seed=0):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(n_s, b * s, m, m, 2), jnp.float32)
    sampled = SampledRoIs(
        boxes=jnp.asarray(rng.uniform(0, 50, (b, s, 4)), jnp.float32),
        labels=jnp.ones((b, s), jnp.int32),
        reg_targets=jnp.zeros((b, s, 4), jnp.float32),
        matched_gt=jnp.asarray(rng.randint(0, g, (b, s)), jnp.int32),
        is_pos=jnp.ones((b, s), bool),
        valid=jnp.ones((b, s), bool),
    )
    gt_masks = jnp.asarray(rng.rand(b, g, 28, 28) > 0.5, jnp.float32)
    gt_boxes = jnp.tile(
        jnp.asarray([[10.0, 10.0, 60.0, 60.0]], jnp.float32), (b, g, 1)
    )[..., :]
    return logits, sampled, gt_masks, gt_boxes


def test_estimators_identical_at_one_sample():
    logits, sampled, gt_masks, gt_boxes = _inputs(1)
    a = mask_head_loss(
        logits, sampled, gt_masks, gt_boxes, estimator="sampled_bce"
    )
    b = mask_head_loss(
        logits, sampled, gt_masks, gt_boxes, estimator="logmeanexp"
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_logmeanexp_attenuates():
    # log-mean-exp of -bce >= mean of -bce (Jensen), so the attenuated
    # loss is <= the sampled mean — one lucky sample caps a pixel's loss
    logits, sampled, gt_masks, gt_boxes = _inputs(8)
    mean = mask_head_loss(
        logits, sampled, gt_masks, gt_boxes, estimator="sampled_bce"
    )
    att = mask_head_loss(
        logits, sampled, gt_masks, gt_boxes, estimator="logmeanexp"
    )
    assert float(att) < float(mean)
    assert np.isfinite(float(att))


def test_unknown_estimator_raises():
    logits, sampled, gt_masks, gt_boxes = _inputs(2)
    with pytest.raises(ValueError):
        mask_head_loss(
            logits, sampled, gt_masks, gt_boxes, estimator="bogus"
        )


def test_sigma_gradient_direction_per_estimator():
    """The analytic core of the ablation study: on a
    confidently-contradicted pixel (mu >> 0, target 0), mean
    sampled-BCE pushes sigma DOWN (Jensen) while logmeanexp rewards a
    lucky sample and pushes sigma UP."""
    key = jax.random.PRNGKey(0)
    eps = jax.random.normal(key, (512,))
    y = 0.0
    mu = 4.0

    def loss(log_sigma, estimator):
        z = mu + eps * jnp.exp(log_sigma)
        bce = jnp.logaddexp(0.0, z) - y * z
        if estimator == "logmeanexp":
            return -(jax.nn.logsumexp(-bce) - jnp.log(float(eps.size)))
        return bce.mean()

    g_mean = jax.grad(lambda s: loss(s, "sampled_bce"))(0.0)
    g_att = jax.grad(lambda s: loss(s, "logmeanexp"))(0.0)
    assert float(g_mean) > 0, "mean-BCE should shrink sigma"
    assert float(g_att) < 0, "attenuation should grow sigma"
