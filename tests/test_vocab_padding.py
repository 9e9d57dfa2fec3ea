"""Vocab-parallel padding at real (odd) vocabulary sizes (VERDICT r4 #1).

The production class tables are 49 rows (open-vocab COCO) and 1203 rows
(LVIS) — neither divides a >1 'model' mesh axis, so a bare
PartitionSpec('model', None) input sharding is rejected by jax.jit.
pad_vocab_tables pads tables to the axis multiple and adds row masks;
batch_shardings falls back to replication for any table left unpadded.
These are the fast, pure-logic checks; the jitted odd-vocab
sharded == unsharded equivalence lives in test_multidevice_equivalence,
and the driver gate itself runs in test_graft_entry.
"""

import jax.sharding as shd
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
    batch_shardings,
    pad_vocab_tables,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import make_mesh


def hybrid_mesh():
    return make_mesh(("data", "model"), (4, 2))


def test_pad_vocab_tables_pads_odd_tables_and_masks_rows():
    mesh = hybrid_mesh()
    rng = np.random.RandomState(0)
    batch = {
        "images": rng.rand(8, 16, 16, 3).astype(np.float32),
        "class_embeddings": rng.randn(49, 16).astype(np.float32),
        "lvis_class_embeddings": rng.randn(1203, 16).astype(np.float32),
    }
    out = pad_vocab_tables(batch, mesh)
    assert out["class_embeddings"].shape == (50, 16)
    assert out["lvis_class_embeddings"].shape == (1204, 16)
    np.testing.assert_array_equal(
        out["class_embeddings"][:49], batch["class_embeddings"]
    )
    assert (out["class_embeddings"][49:] == 0).all()
    np.testing.assert_array_equal(
        out["class_valid"], np.arange(50) < 49
    )
    np.testing.assert_array_equal(
        out["lvis_class_valid"], np.arange(1204) < 1203
    )
    # untouched keys pass through; input batch is not mutated
    assert out["images"] is batch["images"]
    assert batch["class_embeddings"].shape == (49, 16)

    # idempotent: padding a padded batch changes nothing
    again = pad_vocab_tables(out, mesh)
    for k in out:
        np.testing.assert_array_equal(np.asarray(again[k]), np.asarray(out[k]))


def test_pad_vocab_tables_pads_ft_emb_name_rows():
    mesh = hybrid_mesh()
    batch = {
        "lvis_name_ids": np.ones((1203, 4), np.int32),
        "lvis_name_mask": np.ones((1203, 4), np.int32),
    }
    out = pad_vocab_tables(batch, mesh)
    assert out["lvis_name_ids"].shape == (1204, 4)
    assert out["lvis_name_mask"].shape == (1204, 4)
    # pad rows are fully masked -> extract_word_embeddings gives zero rows
    assert (out["lvis_name_mask"][1203:] == 0).all()
    np.testing.assert_array_equal(
        out["lvis_class_valid"], np.arange(1204) < 1203
    )


def test_pad_vocab_tables_noop_without_model_axis():
    mesh = make_mesh(("data",), (8,))
    batch = {"class_embeddings": np.zeros((49, 16), np.float32)}
    out = pad_vocab_tables(batch, mesh)
    assert out["class_embeddings"].shape == (49, 16)
    assert "class_valid" not in out


def test_batch_shardings_divisible_tables_vocab_parallel():
    mesh = hybrid_mesh()
    batch = pad_vocab_tables(
        {
            "images": np.zeros((8, 8, 8, 3), np.float32),
            "class_embeddings": np.zeros((49, 16), np.float32),
            "lvis_class_embeddings": np.zeros((1203, 16), np.float32),
        },
        mesh,
    )
    sh = batch_shardings(batch, mesh)
    assert sh["class_embeddings"].spec == shd.PartitionSpec("model", None)
    assert sh["lvis_class_embeddings"].spec == shd.PartitionSpec(
        "model", None
    )
    assert sh["class_valid"].spec == shd.PartitionSpec()
    assert sh["lvis_class_valid"].spec == shd.PartitionSpec()
    assert sh["images"].spec[0] is not None


def test_batch_shardings_odd_table_falls_back_to_replication():
    """An unpadded odd table must never produce an input sharding
    jax.jit rejects — the round-4 MULTICHIP failure mode."""
    mesh = hybrid_mesh()
    sh = batch_shardings(
        {
            "class_embeddings": np.zeros((49, 16), np.float32),
            "lvis_class_embeddings": np.zeros((1203, 16), np.float32),
        },
        mesh,
    )
    assert sh["class_embeddings"].spec == shd.PartitionSpec()
    assert sh["lvis_class_embeddings"].spec == shd.PartitionSpec()
