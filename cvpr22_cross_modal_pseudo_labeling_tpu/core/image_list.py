"""Padded image batches.

Replacement for the reference ImageList
(reference: maskrcnn_benchmark/structures/image_list.py:7-72).  On TPU the
batch tensor is padded host-side to one of a small set of static buckets
(cfg.TPU.IMAGE_BUCKETS) rather than to the per-batch max, so XLA compiles
a bounded number of programs.  Layout is NHWC (TPU-preferred).
"""

from typing import Sequence, Tuple

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class ImageBatch:
    """tensors: [B, H, W, 3] padded images; image_sizes: [B, 2] (h, w) of
    the un-padded content."""

    tensors: jnp.ndarray
    image_sizes: jnp.ndarray  # int32 [B, 2] = (h, w)

    @property
    def batch(self) -> int:
        return self.tensors.shape[0]

    @property
    def padded_hw(self) -> Tuple[int, int]:
        return self.tensors.shape[1], self.tensors.shape[2]


def to_image_batch(
    images: Sequence[np.ndarray],
    size_divisible: int = 0,
    bucket_hw: Tuple[int, int] | None = None,
) -> ImageBatch:
    """Stacks HWC numpy images into a padded ImageBatch (host-side).

    Mirrors to_image_list (image_list.py:29-72): pad to max size, round up
    to ``size_divisible``; optionally force a fixed ``bucket_hw``.
    """
    sizes = np.array([im.shape[:2] for im in images], np.int32)
    if bucket_hw is not None:
        max_h, max_w = bucket_hw
        big = sizes.max(axis=0)
        if big[0] > max_h or big[1] > max_w:
            raise ValueError(
                f"image of size {tuple(int(v) for v in big)} exceeds the "
                f"forced bucket {tuple(bucket_hw)} — check "
                f"TPU.IMAGE_BUCKETS against INPUT.MAX_SIZE_*"
            )
    else:
        max_h, max_w = sizes.max(axis=0)
    if size_divisible > 0:
        max_h = int(np.ceil(max_h / size_divisible) * size_divisible)
        max_w = int(np.ceil(max_w / size_divisible) * size_divisible)
    batch = np.zeros((len(images), max_h, max_w, images[0].shape[-1]), np.float32)
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        batch[i, :h, :w] = im
    return ImageBatch(jnp.asarray(batch), jnp.asarray(sizes))
