"""Grain-based pipeline: sharding, determinism, repeat factors,
checkpointable iterator state, and the (batch, indices) loader
contract."""

import numpy as np
import pytest

pytest.importorskip("grain")

from cvpr22_cross_modal_pseudo_labeling_tpu.data.grain_loader import (
    GrainLoader,
    _expand_repeat_factors,
)


class TinyDataset:
    def __init__(self, n=10, fail_at=None):
        self.n = n
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i == self.fail_at:
            raise ValueError("corrupt")
        return {"x": np.full((2,), i, np.float32)}


def list_collator(samples):
    return {"x": np.stack([s["x"] for s in samples])}


def test_grain_eval_order_and_contract():
    loader = GrainLoader(
        TinyDataset(10), list_collator, batch_size=3,
        shuffle=False, drop_last=False, num_threads=2,
    )
    assert len(loader) == 4
    batches = list(loader)
    assert len(batches) == 4
    all_idx = [i for _, idx in batches for i in idx]
    assert all_idx == list(range(10))
    np.testing.assert_allclose(batches[0][0]["x"][:, 0], [0, 1, 2])


def test_grain_sharding_disjoint():
    seen = []
    for shard in range(2):
        loader = GrainLoader(
            TinyDataset(10), list_collator, batch_size=5,
            shuffle=False, shard_index=shard, shard_count=2,
            drop_last=False, num_threads=1,
        )
        seen.append(
            sorted(i for _, idx in loader for i in idx)
        )
    assert set(seen[0]).isdisjoint(seen[1])
    assert sorted(seen[0] + seen[1]) == list(range(10))


def test_grain_train_deterministic_and_bounded():
    def run():
        loader = GrainLoader(
            TinyDataset(10), list_collator, batch_size=4,
            shuffle=True, seed=7, num_iters=6, drop_last=True,
            num_threads=2,
        )
        return [tuple(idx) for _, idx in loader]

    a, b = run(), run()
    assert a == b  # seeded shuffle is reproducible
    assert len(a) == 6  # bounded by num_iters, crossing epochs


def test_grain_start_iter_resume_matches():
    full = GrainLoader(
        TinyDataset(10), list_collator, batch_size=4,
        shuffle=True, seed=7, num_iters=6, drop_last=True,
    )
    resumed = GrainLoader(
        TinyDataset(10), list_collator, batch_size=4,
        shuffle=True, seed=7, num_iters=6, start_iter=3, drop_last=True,
    )
    full_batches = [tuple(idx) for _, idx in full]
    res_batches = [tuple(idx) for _, idx in resumed]
    assert res_batches == full_batches[3:]


def test_grain_iterator_state_checkpointing():
    loader = GrainLoader(
        TinyDataset(10), list_collator, batch_size=4,
        shuffle=True, seed=3, num_iters=6, drop_last=True,
    )
    it = loader.iterator()
    first_two = [tuple(next(it)[1]) for _ in range(2)]
    state = loader.get_state()
    rest = [tuple(idx) for _, idx in it]

    loader2 = GrainLoader(
        TinyDataset(10), list_collator, batch_size=4,
        shuffle=True, seed=3, num_iters=6, drop_last=True,
    )
    loader2.set_state(state)
    rest2 = [tuple(idx) for _, idx in loader2.iterator()]
    assert rest2 == rest
    assert len(first_two) + len(rest) == 6


def test_grain_corrupt_sample_substitution():
    loader = GrainLoader(
        TinyDataset(6, fail_at=2), list_collator, batch_size=3,
        shuffle=False, drop_last=False, num_threads=1,
    )
    all_idx = [i for _, idx in loader for i in idx]
    assert 2 not in all_idx
    assert all_idx.count(3) == 2  # neighbor substituted


def test_expand_repeat_factors():
    out = _expand_repeat_factors([1.0, 2.0, 1.6, 0.2])
    assert out == [0, 1, 1, 2, 2, 3]


def test_loader_state_save_restore_roundtrip(tmp_path):
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.trainer import (
        _save_loader_state,
        restore_loader_state,
    )

    loader = GrainLoader(
        TinyDataset(10), list_collator, batch_size=4,
        shuffle=True, seed=11, num_iters=6, drop_last=True,
    )
    it = loader.iterator()
    consumed = [tuple(next(it)[1]) for _ in range(2)]
    _save_loader_state(str(tmp_path), loader)
    rest = [tuple(idx) for _, idx in it]

    loader2 = GrainLoader(
        TinyDataset(10), list_collator, batch_size=4,
        shuffle=True, seed=11, num_iters=6, drop_last=True,
    )
    assert restore_loader_state(str(tmp_path), loader2)
    assert [tuple(idx) for _, idx in loader2] == rest
    assert len(consumed) == 2

    # thread loader (no get_state) is a no-op on both sides
    class Plain:
        pass

    _save_loader_state(str(tmp_path), Plain())
    assert restore_loader_state(str(tmp_path), Plain()) is False


def test_grain_eval_loader_reiterable():
    """An eval loader (num_iters=None) is re-iterated every
    TEST_PERIOD; each pass must yield the full dataset, not an
    exhausted single-use iterator."""
    loader = GrainLoader(
        TinyDataset(10), list_collator, batch_size=3,
        shuffle=False, drop_last=False, num_threads=2,
    )
    first = [i for _, idx in loader for i in idx]
    second = [i for _, idx in loader for i in idx]
    assert first == list(range(10))
    assert second == first, "second eval pass saw an exhausted iterator"


def test_loader_state_publishes_with_checkpoint_not_before(tmp_path):
    """The grain stream position is staged with the pipelined save and
    written only when the checkpoint PUBLISHES (tag update), so a crash
    between save-start and publish cannot leave loader_state.json one
    checkpoint period ahead of last_checkpoint."""
    import os

    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
        discard_pending_checkpoint,
        flush_pending_checkpoint,
        save_checkpoint,
    )
    from cvpr22_cross_modal_pseudo_labeling_tpu.engine.trainer import (
        _loader_state_extras,
        loader_state_path,
    )

    loader = GrainLoader(
        TinyDataset(10), list_collator, batch_size=4,
        shuffle=True, seed=5, num_iters=6, drop_last=True,
    )
    it = loader.iterator()
    next(it)
    state_file = loader_state_path(str(tmp_path))

    # a DISCARDED pending save must not publish the loader state
    save_checkpoint(
        str(tmp_path), {"w": np.zeros(2)}, 1, block=False,
        extras=_loader_state_extras(str(tmp_path), loader),
    )
    discard_pending_checkpoint()
    assert not os.path.exists(state_file)
    assert not os.path.exists(tmp_path / "last_checkpoint")

    # a FLUSHED pending save publishes tag and loader state together
    save_checkpoint(
        str(tmp_path), {"w": np.zeros(2)}, 2, block=False,
        extras=_loader_state_extras(str(tmp_path), loader),
    )
    assert not os.path.exists(state_file), "sidecar outran the tag"
    flush_pending_checkpoint()
    assert os.path.exists(state_file)
    assert (tmp_path / "last_checkpoint").read_text().endswith("model_0000002")
