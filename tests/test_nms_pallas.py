import jax.numpy as jnp
import numpy as np
import pytest

from cvpr22_cross_modal_pseudo_labeling_tpu.ops.nms_pallas import nms_pallas
from tests.test_nms import np_greedy_nms, random_boxes


@pytest.mark.parametrize("n,tile", [(200, 64), (300, 128)])
def test_pallas_nms_matches_greedy(n, tile):
    rng = np.random.RandomState(0)
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    ref = np_greedy_nms(boxes, scores, 0.5)
    idx, keep = nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool),
        0.5, n, tile=tile, interpret=True,
    )
    ours = np.asarray(idx)[np.asarray(keep)]
    np.testing.assert_array_equal(ours, ref)


def test_pallas_nms_labels_matches_batched_nms():
    """Per-class suppression in the kernel must agree with the XLA
    batched_nms path on every kept index."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.ops.nms import batched_nms

    rng = np.random.RandomState(11)
    n = 150
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    labels = rng.randint(0, 4, n).astype(np.int32)
    ref_idx, ref_keep = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        jnp.ones(n, bool), 0.5, n, tile=64,
    )
    idx, keep = nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool),
        0.5, n, tile=64, interpret=True, labels=jnp.asarray(labels),
    )
    np.testing.assert_array_equal(
        np.asarray(idx)[np.asarray(keep)],
        np.asarray(ref_idx)[np.asarray(ref_keep)],
    )


def test_pallas_nms_capacity_exceeds_input():
    boxes = random_boxes(np.random.RandomState(2), 20)
    idx, keep = nms_pallas(
        jnp.asarray(boxes),
        jnp.asarray(np.linspace(1, 0, 20, dtype=np.float32)),
        jnp.ones(20, bool), 0.5, 100, tile=64, interpret=True,
    )
    assert idx.shape == (100,) and keep.shape == (100,)
    assert not bool(np.asarray(keep)[20:].any())


def test_pallas_nms_respects_valid():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
    )
    scores = np.array([0.9, 0.95, 0.1], np.float32)
    idx, keep = nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.array([True, False, True]), 0.5, 3, tile=64, interpret=True,
    )
    kept = set(np.asarray(idx)[np.asarray(keep)].tolist())
    assert kept == {0, 2}
