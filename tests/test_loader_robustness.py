import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.data.build import (
    PrefetchingLoader,
    _FixedBatchSampler,
)


class FlakyDataset:
    """Every third sample raises; the loader must substitute."""

    def __len__(self):
        return 9

    def __getitem__(self, i):
        if i % 3 == 2:
            raise OSError(f"corrupt sample {i}")
        return {"idx": i}

    def get_img_info(self, i):
        return {"height": 4, "width": 4}


def test_prefetching_loader_substitutes_bad_samples():
    ds = FlakyDataset()
    sampler = _FixedBatchSampler(list(range(9)), batch_size=3)
    collected = []
    loader = PrefetchingLoader(
        ds, sampler, collator=lambda samples: samples, num_workers=2
    )
    for samples, idxs in loader:
        collected.append((samples, idxs))
    assert len(collected) == 3
    # index 2 failed -> replaced by sample 3
    batch0 = collected[0][0]
    assert [s["idx"] for s in batch0] == [0, 1, 3]


def test_fixed_batch_sampler_partial_batch():
    s = _FixedBatchSampler(list(range(5)), batch_size=2)
    assert list(s) == [[0, 1], [2, 3], [4]]
    s2 = _FixedBatchSampler(list(range(5)), batch_size=2, drop_last=True)
    assert list(s2) == [[0, 1], [2, 3]]


class DoubleFaultDataset:
    """Adjacent samples both raise: the neighbor substitution itself
    fails, so the producer thread must surface the error instead of
    masquerading as a clean end-of-stream."""

    def __len__(self):
        return 4

    def __getitem__(self, i):
        if i in (1, 2):
            raise OSError(f"corrupt sample {i}")
        return {"idx": i}


def test_producer_exception_surfaces_not_silent_exhaustion():
    import pytest

    ds = DoubleFaultDataset()
    sampler = _FixedBatchSampler(list(range(4)), batch_size=2)
    loader = PrefetchingLoader(
        ds, sampler, collator=lambda s: s, num_workers=2
    )
    with pytest.raises(RuntimeError, match="producer thread failed"):
        for _ in loader:
            pass


def test_collator_exception_surfaces():
    import pytest

    def bad_collator(samples):
        raise ValueError("collate blew up")

    ds = FlakyDataset()
    sampler = _FixedBatchSampler(list(range(3)), batch_size=3)
    loader = PrefetchingLoader(ds, sampler, bad_collator, num_workers=1)
    with pytest.raises(RuntimeError, match="producer thread failed"):
        list(loader)


def test_abandoned_iterator_unparks_producer():
    """An iterator dropped mid-stream (islice'd val-loss passes,
    do_train's MAX_ITER break) must not leave the producer thread
    parked in Queue.put forever."""
    import threading
    import time

    before = {t.ident for t in threading.enumerate()}
    ds = FlakyDataset()
    # plenty of batches so the bounded queue (4) fills and the producer
    # blocks in put while the consumer walks away after one batch
    sampler = _FixedBatchSampler([i % 2 for i in range(64)], batch_size=1)
    loader = PrefetchingLoader(
        ds, sampler, collator=lambda s: s, num_workers=1
    )
    it = iter(loader)
    next(it)
    it.close()  # generator finally -> stop.set()
    deadline = time.time() + 5.0
    while time.time() < deadline:
        alive = [
            t for t in threading.enumerate()
            if t.ident not in before and t.is_alive()
        ]
        if not alive:
            break
        time.sleep(0.05)
    assert not alive, f"producer threads leaked: {alive}"
