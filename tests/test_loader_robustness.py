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
