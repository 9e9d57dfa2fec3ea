"""Grain-based production data pipeline.

An alternative to the thread-pool PrefetchingLoader (build.py:71-126)
built on Google's `grain` — the TPU-ecosystem input pipeline.  What it
adds over the thread loader (and over the reference's torch DataLoader,
data/build.py:115-192):

  * deterministic, seedable global shuffle with per-epoch reseeding;
  * process sharding by slicing the record space (replaces the
    reference's DistributedSampler rank/num_replicas arithmetic,
    data/samplers/distributed.py);
  * checkpointable iterator state (``get_state``/``set_state``) so a
    resumed job continues mid-epoch at the exact batch — the reference
    approximates this with start_iter fast-forwarding of the sampler;
  * random access to *batches*: the batched pipeline is a MapDataset,
    so resume-at-iteration is a slice, not a replay.

Repeat-factor oversampling (LVIS/OpenImages category rebalancing,
reference data/samplers/repeat_factors.py) is applied by expanding the
index space before sharding.  Aspect-ratio/bucket grouping is NOT
applied here: it would reorder samples and break the "resume is a
slice" property above.  The collator still pads correctly, but a mixed
batch rides the largest member's bucket — the threaded loader (the
throughput default, docs/design.md §9) groups by target bucket
(DATALOADER.GROUP_BY_BUCKET) and pays minimal padding instead.
"""

import math
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


class _RobustIndexedSource:
    """Random-access source yielding (dataset_index, sample); a corrupt
    sample falls back to a neighboring index (same soft-failure policy
    as PrefetchingLoader._fetch, build.py:81-94)."""

    def __init__(self, dataset, index_map: Optional[Sequence[int]] = None):
        self.dataset = dataset
        self.index_map = (
            np.asarray(index_map, np.int64)
            if index_map is not None
            else None
        )

    def __len__(self) -> int:
        return (
            len(self.index_map)
            if self.index_map is not None
            else len(self.dataset)
        )

    def __getitem__(self, i: int) -> Tuple[int, dict]:
        idx = int(self.index_map[i]) if self.index_map is not None else int(i)
        try:
            return idx, self.dataset[idx]
        except Exception as e:
            from ..utils.logger import get_logger

            get_logger("data").warning(
                "sample %d failed (%s: %s); substituting neighbor",
                idx, type(e).__name__, e,
            )
            idx = (idx + 1) % len(self.dataset)
            return idx, self.dataset[idx]


def _expand_repeat_factors(repeat_factors: Sequence[float]) -> List[int]:
    """Deterministic expansion: each index appears floor(rf) times plus
    one more for the fractional part (stochastic rounding in the
    reference, repeat_factors.py; deterministic ceil-by-threshold here
    keeps the grain pipeline reproducible)."""
    out: List[int] = []
    for i, rf in enumerate(repeat_factors):
        n = int(math.floor(rf))
        if rf - n >= 0.5:
            n += 1
        out.extend([i] * max(n, 1))
    return out


class GrainLoader:
    """Iterable of (batch_dict, dataset_indices) batches, matching the
    PrefetchingLoader contract consumed by the trainer and inference.

    ``iterator()`` exposes the underlying grain DatasetIterator whose
    get_state()/set_state() make the data stream checkpointable.
    """

    def __init__(
        self,
        dataset,
        collator,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_iters: Optional[int] = None,
        start_iter: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
        drop_last: bool = True,
        num_threads: int = 8,
        prefetch_batches: int = 4,
        repeat_factors: Optional[Sequence[float]] = None,
    ):
        import grain

        index_map = (
            _expand_repeat_factors(repeat_factors)
            if repeat_factors is not None
            else None
        )
        source = _RobustIndexedSource(dataset, index_map)
        self._source = source
        self._collator = collator
        self._example_batch_size = batch_size

        def collate(samples):
            indices = [i for i, _ in samples]
            batch = collator([s for _, s in samples])
            return batch, indices

        pipe = grain.MapDataset.source(source)
        if shard_count > 1:
            pipe = pipe.slice(slice(shard_index, None, shard_count))
        pipe = pipe.seed(seed)
        if shuffle:
            pipe = pipe.shuffle()
        n_records = len(pipe)
        if num_iters is not None:
            # infinite epochs, bounded by the batch-level slice below
            pipe = pipe.repeat(None)
        batched = pipe.batch(
            batch_size, drop_remainder=drop_last, batch_fn=collate
        )
        if num_iters is not None:
            batched = batched.slice(slice(start_iter, num_iters))
            self._len = max(num_iters - start_iter, 0)
        else:
            self._len = (
                n_records // batch_size
                if drop_last
                else math.ceil(n_records / batch_size)
            )
        self._iter_ds = batched.to_iter_dataset(
            grain.ReadOptions(
                num_threads=num_threads,
                # grain caps usable threads at the buffer size; a
                # buffer below num_threads silently serializes reads
                prefetch_buffer_size=max(prefetch_batches, num_threads),
            )
        )
        self._it = None
        # Only the bounded training stream is checkpointable (its
        # get_state/set_state must survive across __iter__ calls); an
        # eval loader is re-iterated every TEST_PERIOD, so it gets a
        # fresh iterator per pass instead of one single-use iterator.
        self._persistent = num_iters is not None

    def __len__(self) -> int:
        return self._len

    def example_batch(self):
        """One collated batch built directly from the dataset head,
        without touching the (checkpointable) grain iterator — used for
        parameter init (tools/train_net.py)."""
        n = min(self._example_batch_size, len(self._source))
        samples = [self._source[i] for i in range(n)]
        indices = [i for i, _ in samples]
        return self._collator([s for _, s in samples]), indices

    def iterator(self):
        """The live grain DatasetIterator (created on first use);
        supports get_state()/set_state() for data checkpointing."""
        if self._it is None:
            self._it = iter(self._iter_ds)
        return self._it

    def __iter__(self) -> Iterator:
        it = self.iterator() if self._persistent else iter(self._iter_ds)
        for item in it:
            yield item

    # -- data-stream checkpointing ------------------------------------
    def get_state(self):
        return self.iterator().get_state()

    def set_state(self, state) -> None:
        self.iterator().set_state(state)


def make_grain_loader(cfg, dataset, collator, is_train: bool,
                      start_iter: int = 0, shard_index: int = 0,
                      shard_count: int = 1) -> GrainLoader:
    """cfg-driven construction mirroring make_data_loader's sampler
    stack (build.py:129-188) on the grain pipeline."""
    if is_train:
        per_host = cfg.SOLVER.IMS_PER_BATCH // max(shard_count, 1)
        return GrainLoader(
            dataset,
            collator,
            batch_size=per_host,
            shuffle=True,
            seed=cfg.DATALOADER.GRAIN_SEED,
            num_iters=cfg.SOLVER.MAX_ITER,
            start_iter=start_iter,
            shard_index=shard_index,
            shard_count=shard_count,
            drop_last=cfg.DATALOADER.DROP_LAST,
            num_threads=max(cfg.DATALOADER.NUM_WORKERS, 1),
            repeat_factors=getattr(dataset, "repeat_factors", None),
        )
    return GrainLoader(
        dataset,
        collator,
        batch_size=cfg.TEST.IMS_PER_BATCH // max(shard_count, 1),
        shuffle=False,
        seed=cfg.DATALOADER.GRAIN_SEED,
        num_iters=None,
        shard_index=shard_index,
        shard_count=shard_count,
        drop_last=False,
        num_threads=max(cfg.DATALOADER.NUM_WORKERS, 1),
    )
