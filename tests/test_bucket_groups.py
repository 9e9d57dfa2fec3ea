"""Bucket-homogeneous batch grouping (DATALOADER.GROUP_BY_BUCKET).

The reference groups train batches only by binary aspect
(data/build.py:71-113 _quantize([1])); grouping by TARGET BUCKET is
strictly finer (Resize keeps aspect) and makes each batch pad to its
own rung of TPU.IMAGE_BUCKETS instead of the widest member's.
"""

import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.data.collate import (
    select_bucket,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.data.samplers import (
    GroupedBatchSampler,
    compute_bucket_groups,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.data.transforms import (
    get_resize_hw,
)

LADDER = (
    (800, 1088),
    (800, 1216),
    (800, 1333),
    (1088, 800),
    (1216, 800),
    (1333, 800),
    (1024, 1024),
)


class _FakeDataset:
    def __init__(self, sizes):
        self.sizes = sizes  # [(h, w)]

    def __len__(self):
        return len(self.sizes)

    def get_img_info(self, i):
        h, w = self.sizes[i]
        return {"height": h, "width": w}


def test_bucket_groups_map_to_expected_rungs():
    # (orig h, w) -> expected ladder rung after Resize(800, 1333)
    cases = [
        ((480, 640), (800, 1088)),   # 4:3 landscape -> 800x1066
        ((375, 500), (800, 1088)),   # 4:3 landscape (small)
        ((427, 640), (800, 1216)),   # ~3:2 landscape -> 800x1199
        ((360, 640), (800, 1333)),   # 16:9 -> 800x1422 capped -> 749x1333
        ((640, 480), (1088, 800)),   # 3:4 portrait -> 1066x800
        ((640, 427), (1216, 800)),   # 2:3 portrait -> 1199x800
        ((612, 612), (800, 1088)),   # square -> 800x800, smallest rung
    ]
    ds = _FakeDataset([c[0] for c in cases])
    groups = compute_bucket_groups(ds, LADDER, 800, 1333)
    for (orig, expected), g in zip(cases, groups):
        assert g < len(LADDER), f"{orig} fell to the overflow group"
        assert LADDER[g] == expected, (
            f"{orig} -> rung {LADDER[g]}, expected {expected}"
        )
        # the group rung really is what the collator would select
        nh, nw = get_resize_hw(orig, 800, 1333)
        assert select_bucket(nh, nw, LADDER, 64) == expected


def test_bucket_groups_overflow_and_degenerate():
    # overflow images group by their OWN divisible-pad fallback shape
    # (one compiled program per distinct fallback, not per batch
    # composition — advisor r4); degenerate metadata takes the canonical
    # min_size square's group.  Two images sharing a fallback shape
    # share a group; distinct fallbacks get distinct groups.
    ds = _FakeDataset([(4000, 100), (0, 0), (2000, 50)])
    groups = compute_bucket_groups(ds, ((64, 64),), 800, 1333)
    assert len(set(groups)) == 2  # both 40:1 images share one fallback
    assert groups[0] == groups[2] != groups[1]
    assert min(groups) >= 1  # none fit the (64, 64)-only ladder


def test_grouped_batches_are_bucket_homogeneous():
    rng = np.random.RandomState(0)
    sizes = [
        [(480, 640), (427, 640), (640, 480), (612, 612)][rng.randint(4)]
        for _ in range(64)
    ]
    ds = _FakeDataset(sizes)
    groups = compute_bucket_groups(ds, LADDER, 800, 1333)
    batches = list(
        GroupedBatchSampler(range(len(ds)), groups, 4, drop_last=True)
    )
    assert batches, "no full batches"
    for batch in batches:
        rungs = {
            select_bucket(
                *get_resize_hw(ds.sizes[i], 800, 1333), LADDER, 64
            )
            for i in batch
        }
        assert len(rungs) == 1, f"mixed-bucket batch: {rungs}"
