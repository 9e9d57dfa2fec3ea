"""Device-side uint8 normalization (models/backbone.py:device_normalize,
INPUT.DEVICE_NORMALIZE) must reproduce the host Normalize transform
(data/transforms.py, reference transforms.py:110-120) bit-for-bit,
including the zero-padded region outside each image's true size
(reference image_list.py:54-66 pads AFTER normalization)."""

import numpy as np
import jax.numpy as jnp

from cvpr22_cross_modal_pseudo_labeling_tpu.data.transforms import Normalize
from cvpr22_cross_modal_pseudo_labeling_tpu.data.collate import BatchCollator
from cvpr22_cross_modal_pseudo_labeling_tpu.models.backbone import (
    device_normalize,
)

MEAN = (102.9801, 115.9465, 122.7717)
STD = (1.0, 1.0, 1.0)


def _host_path(imgs_u8, sizes, H, W, to_bgr255=True):
    norm = Normalize(MEAN, STD, to_bgr255=to_bgr255)
    out = np.zeros((len(imgs_u8), H, W, 3), np.float32)
    for i, (img, (h, w)) in enumerate(zip(imgs_u8, sizes)):
        s = norm({"image": img}, None)
        out[i, :h, :w] = s["image"]
    return out


def _device_path(imgs_u8, sizes, H, W, to_bgr255=True):
    batch = np.zeros((len(imgs_u8), H, W, 3), np.uint8)
    for i, (img, (h, w)) in enumerate(zip(imgs_u8, sizes)):
        batch[i, :h, :w] = img
    return np.asarray(
        device_normalize(
            jnp.asarray(batch), jnp.asarray(sizes, np.int32),
            MEAN, STD, to_bgr255,
        )
    )


def test_uint8_path_matches_host_normalize():
    rng = np.random.RandomState(0)
    sizes = [(37, 53), (64, 41)]
    imgs = [rng.randint(0, 255, (h, w, 3), np.uint8) for h, w in sizes]
    host = _host_path(imgs, sizes, 64, 64)
    dev = _device_path(imgs, sizes, 64, 64)
    np.testing.assert_array_equal(host, dev)


def test_rgb01_convention_matches():
    rng = np.random.RandomState(1)
    sizes = [(30, 30)]
    imgs = [rng.randint(0, 255, (30, 30, 3), np.uint8)]
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    norm = Normalize(mean, std, to_bgr255=False)
    host = np.zeros((1, 32, 32, 3), np.float32)
    host[0, :30, :30] = norm({"image": imgs[0]}, None)["image"]
    batch = np.zeros((1, 32, 32, 3), np.uint8)
    batch[0, :30, :30] = imgs[0]
    dev = np.asarray(
        device_normalize(
            jnp.asarray(batch), jnp.asarray(sizes, np.int32),
            mean, std, False,
        )
    )
    np.testing.assert_allclose(host, dev, rtol=0, atol=1e-6)


def test_float_input_passthrough():
    x = jnp.ones((1, 8, 8, 3), jnp.float32) * 3.5
    out = device_normalize(x, jnp.asarray([[8, 8]], np.int32), MEAN, STD, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_collator_emits_uint8_when_deferred():
    rng = np.random.RandomState(2)
    collator = BatchCollator(buckets=((64, 64),), max_gt=4)
    samples = [
        {
            "image": rng.randint(0, 255, (48, 64, 3), np.uint8),
            "boxes": np.asarray([[1.0, 1.0, 10.0, 10.0]], np.float32),
            "labels": np.asarray([1], np.int32),
        }
    ]
    batch = collator(samples)
    assert batch["images"].dtype == np.uint8
    samples[0]["image"] = samples[0]["image"].astype(np.float32)
    assert collator(samples)["images"].dtype == np.float32
