import jax
import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.core import (
    balanced_sample_indices,
    balanced_sample_masks,
    match_boxes,
)


def numpy_reference_matcher(quality, high, low, allow_low_quality):
    """Direct numpy transcription of the torch Matcher semantics
    (maskrcnn_benchmark/modeling/matcher.py) for golden comparison."""
    matched_vals = quality.max(axis=0)
    matches = quality.argmax(axis=0)
    all_matches = matches.copy()
    matches = matches.astype(np.int64)
    matches[matched_vals < low] = -1
    matches[(matched_vals >= low) & (matched_vals < high)] = -2
    if allow_low_quality:
        highest_per_gt = quality.max(axis=1)
        gt_idx, pred_idx = np.nonzero(quality == highest_per_gt[:, None])
        matches[pred_idx] = all_matches[pred_idx]
    return matches


def test_matcher_matches_torch_semantics():
    rng = np.random.RandomState(42)
    for allow in (False, True):
        quality = rng.uniform(0, 1, (7, 40)).astype(np.float32)
        ours = match_boxes(
            jnp.asarray(quality),
            jnp.ones(7, bool),
            high_threshold=0.7,
            low_threshold=0.3,
            allow_low_quality_matches=allow,
        )
        ref = numpy_reference_matcher(quality, 0.7, 0.3, allow)
        np.testing.assert_array_equal(np.asarray(ours), ref)


def test_matcher_ignores_padded_gt():
    quality = np.zeros((4, 10), np.float32)
    quality[0] = 0.9  # valid gt matches everything
    quality[3] = 0.95  # padded gt would win but must be ignored
    gt_valid = jnp.array([True, True, True, False])
    m = match_boxes(jnp.asarray(quality), gt_valid, 0.7, 0.3, True)
    assert np.all(np.asarray(m) == 0)


def test_sampler_quotas():
    key = jax.random.PRNGKey(0)
    n = 100
    pos = jnp.arange(n) < 10  # 10 positives
    neg = (jnp.arange(n) >= 10) & (jnp.arange(n) < 90)  # 80 negatives
    sp, sn = balanced_sample_masks(pos, neg, key, 64, 0.5)
    # num_pos = min(10, 32) = 10; num_neg = min(80, 54) = 54
    assert int(jnp.sum(sp)) == 10
    assert int(jnp.sum(sn)) == 54
    assert not bool(jnp.any(sp & ~pos))
    assert not bool(jnp.any(sn & ~neg))


def test_sampler_indices_layout():
    key = jax.random.PRNGKey(1)
    n = 50
    pos = jnp.arange(n) < 5
    neg = (jnp.arange(n) >= 5) & (jnp.arange(n) < 20)
    idx, valid, is_pos = balanced_sample_indices(pos, neg, key, 32, 0.25)
    assert idx.shape == (32,)
    # 5 positives, 15 negatives -> 20 valid slots
    assert int(jnp.sum(valid)) == 20
    assert int(jnp.sum(is_pos)) == 5
    # positive slots reference positive candidates
    pos_slots = np.asarray(idx)[np.asarray(is_pos)]
    assert np.all(pos_slots < 5)
    neg_slots = np.asarray(idx)[np.asarray(valid & ~is_pos)]
    assert np.all((neg_slots >= 5) & (neg_slots < 20))


def test_sampler_randomness_differs_by_key():
    n = 200
    pos = jnp.arange(n) < 100
    neg = jnp.arange(n) >= 100
    s1, _ = balanced_sample_masks(pos, neg, jax.random.PRNGKey(0), 64, 0.5)
    s2, _ = balanced_sample_masks(pos, neg, jax.random.PRNGKey(1), 64, 0.5)
    assert not np.array_equal(np.asarray(s1), np.asarray(s2))


def test_distributed_sampler_eval_partition_exact():
    """pad=False (eval mode): the ranks partition the dataset exactly —
    no duplicates, nothing missing — so the multi-host prediction
    gather cannot double-count boundary images."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.data.samplers import (
        DistributedSampler,
    )

    n, world = 13, 4
    shards = [
        list(
            DistributedSampler(
                n, num_replicas=world, rank=r, shuffle=False, pad=False
            )
        )
        for r in range(world)
    ]
    flat = sorted(i for s in shards for i in s)
    assert flat == list(range(n))
    # padded mode still duplicates (train-time divisibility contract)
    padded = [
        list(
            DistributedSampler(
                n, num_replicas=world, rank=r, shuffle=False, pad=True
            )
        )
        for r in range(world)
    ]
    assert sum(len(s) for s in padded) == 16
