"""Vectorized IoU matcher.

Functional re-derivation of the reference Matcher
(reference: maskrcnn_benchmark/modeling/matcher.py:5-112) over padded,
masked inputs: no data-dependent shapes, safe under jit/vmap.
"""

import jax.numpy as jnp

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


def match_boxes(
    match_quality: jnp.ndarray,
    gt_valid: jnp.ndarray,
    high_threshold: float,
    low_threshold: float,
    allow_low_quality_matches: bool = False,
) -> jnp.ndarray:
    """Assigns each prediction a gt index or a negative code.

    Args:
      match_quality: [M, N] quality (IoU) between M padded gt and N preds.
      gt_valid: [M] bool mask of real gt rows.
      high_threshold / low_threshold: matcher.py:24-40 semantics.
      allow_low_quality_matches: enables the tie-aware recovery pass
        (matcher.py:85-112).

    Returns:
      [N] int32: matched gt index in [0, M) or BELOW_LOW_THRESHOLD /
      BETWEEN_THRESHOLDS.
    """
    neg_inf = jnp.asarray(-1.0, match_quality.dtype)
    quality = jnp.where(gt_valid[:, None], match_quality, neg_inf)

    matched_vals = jnp.max(quality, axis=0)  # [N]
    all_matches = jnp.argmax(quality, axis=0).astype(jnp.int32)  # [N]

    below_low = matched_vals < low_threshold
    between = (matched_vals >= low_threshold) & (matched_vals < high_threshold)
    matches = jnp.where(
        below_low,
        BELOW_LOW_THRESHOLD,
        jnp.where(between, BETWEEN_THRESHOLDS, all_matches),
    )

    if allow_low_quality_matches:
        # For each gt, recover every prediction tied for its best IoU
        # (including ties — matcher.py:93-112) and restore the
        # pre-threshold argmax assignment for those predictions.
        highest_per_gt = jnp.max(quality, axis=1)  # [M]
        is_best = (quality == highest_per_gt[:, None]) & gt_valid[:, None]
        pred_recovered = jnp.any(is_best, axis=0)  # [N]
        matches = jnp.where(pred_recovered, all_matches, matches)

    return matches.astype(jnp.int32)
