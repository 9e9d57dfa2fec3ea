import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.models.detector.st_generalized_rcnn import (
    init_exemplar_table,
    normalize_rows,
    update_exemplar_table,
)


def test_update_keeps_best_quality():
    table = init_exemplar_table(5, 4)
    labels = jnp.array([2, 2, 3], jnp.int32)
    scores = jnp.array([0.5, 0.9, 0.4])
    embs = jnp.asarray(np.eye(3, 4), jnp.float32)
    valid = jnp.ones(3, bool)
    t1 = update_exemplar_table(table, labels, scores, embs, valid)
    assert bool(t1["valid"][2]) and bool(t1["valid"][3])
    assert not bool(t1["valid"][0])
    # slot 2 holds the 0.9-quality embedding (row 1 of eye)
    np.testing.assert_allclose(
        np.asarray(t1["embs"][2]), np.asarray(normalize_rows(embs)[1])
    )
    assert abs(float(t1["quality"][2]) - 0.9) < 1e-6

    # a later lower-quality candidate must not displace it
    t2 = update_exemplar_table(
        t1,
        jnp.array([2], jnp.int32),
        jnp.array([0.3]),
        jnp.asarray(np.ones((1, 4)), jnp.float32),
        jnp.ones(1, bool),
    )
    np.testing.assert_allclose(
        np.asarray(t2["embs"][2]), np.asarray(t1["embs"][2])
    )
    # a higher-quality one does
    t3 = update_exemplar_table(
        t2,
        jnp.array([2], jnp.int32),
        jnp.array([0.95]),
        jnp.asarray(np.ones((1, 4)), jnp.float32),
        jnp.ones(1, bool),
    )
    assert abs(float(t3["quality"][2]) - 0.95) < 1e-6


def test_update_ignores_invalid():
    table = init_exemplar_table(3, 2)
    t1 = update_exemplar_table(
        table,
        jnp.array([1], jnp.int32),
        jnp.array([0.9]),
        jnp.ones((1, 2)),
        jnp.zeros(1, bool),
    )
    assert not bool(t1["valid"][1])
