"""Balanced positive/negative sampling with static shapes.

Functional re-derivation of BalancedPositiveNegativeSampler
(reference: maskrcnn_benchmark/modeling/balanced_positive_negative_sampler.py:5-68).

Two entry points:
  * ``balanced_sample_masks`` — returns boolean masks over all N
    candidates (what the RPN loss consumes; no gather needed).
  * ``balanced_sample_indices`` — additionally compacts the sampled
    candidates into a static [batch_size] index array, positives first
    (what the RoI head needs to feed a fixed-size RoIAlign batch).

Random subset selection is done by ranking uniform priorities — the
sort-based, shape-static equivalent of ``torch.randperm(...)[:k]``.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def _select_random_subset(
    mask: jnp.ndarray, rand: jnp.ndarray, count: jnp.ndarray, k_cap: int
) -> jnp.ndarray:
    """Marks a uniformly random subset of ``count`` eligible elements.

    Implemented with top_k over random priorities (k_cap = static max
    selectable) instead of a full argsort — at RPN scale the two 63k
    argsorts per image dominated sampling cost; top_k(k<=256) is far
    cheaper on TPU.
    """
    n = mask.shape[0]
    k = min(k_cap, n)
    keyed = jnp.where(mask, rand, -jnp.inf)
    _, idx = jax.lax.top_k(keyed, k)
    take = jnp.arange(k) < count
    out = jnp.zeros((n,), bool).at[idx].set(take, mode="drop")
    return out & mask


def balanced_sample_masks(
    pos_mask: jnp.ndarray,
    neg_mask: jnp.ndarray,
    key: jax.Array,
    batch_size: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Randomly selects <=batch_size elements with the reference's quota
    math: num_pos = min(#pos, batch*frac); num_neg = min(#neg, batch - num_pos).

    Returns (sampled_pos [N] bool, sampled_neg [N] bool).
    """
    n = pos_mask.shape[0]
    kp, kn = jax.random.split(key)
    num_pos_cap = int(batch_size * positive_fraction)

    pos_rand = jax.random.uniform(kp, (n,))
    neg_rand = jax.random.uniform(kn, (n,))

    num_pos = jnp.minimum(jnp.sum(pos_mask.astype(jnp.int32)), num_pos_cap)
    num_neg = jnp.minimum(
        jnp.sum(neg_mask.astype(jnp.int32)), batch_size - num_pos
    )
    sampled_pos = _select_random_subset(
        pos_mask, pos_rand, num_pos, max(num_pos_cap, 1)
    )
    sampled_neg = _select_random_subset(
        neg_mask, neg_rand, num_neg, batch_size
    )
    return sampled_pos, sampled_neg


def balanced_sample_indices(
    pos_mask: jnp.ndarray,
    neg_mask: jnp.ndarray,
    key: jax.Array,
    batch_size: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Like balanced_sample_masks but compacted to [batch_size] indices.

    Returns:
      indices: [batch_size] int32 into the N candidates, sampled positives
        first, then sampled negatives, then arbitrary filler.
      valid:   [batch_size] bool, True for real sampled slots.
      is_pos:  [batch_size] bool, True for the positive slots.
    """
    sampled_pos, sampled_neg = balanced_sample_masks(
        pos_mask, neg_mask, key, batch_size, positive_fraction
    )
    n = pos_mask.shape[0]
    # Sort key: sampled positives (0..1), sampled negatives (1..2), rest.
    tier = jnp.where(sampled_pos, 0.0, jnp.where(sampled_neg, 1.0, 2.0))
    # Deterministic tiebreak keeps candidate order stable within a tier.
    priority = tier + jnp.arange(n, dtype=jnp.float32) / (2.0 * n)
    order = jnp.argsort(priority)
    indices = order[:batch_size].astype(jnp.int32)

    num_sampled = jnp.sum(sampled_pos) + jnp.sum(sampled_neg)
    slot = jnp.arange(batch_size)
    valid = slot < num_sampled
    is_pos = slot < jnp.sum(sampled_pos)
    return indices, valid, is_pos
