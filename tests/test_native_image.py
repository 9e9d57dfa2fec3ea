import io

import numpy as np
import pytest
from PIL import Image

from cvpr22_cross_modal_pseudo_labeling_tpu.utils.native_image import (
    decode_jpeg_native,
    get_lib,
    load_image_rgb,
    resize_bilinear_native,
)

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native imageops not built"
)


def make_jpeg_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def test_decode_matches_pil():
    rng = np.random.RandomState(0)
    # smooth gradient image (jpeg-friendly)
    x = np.linspace(0, 255, 64, dtype=np.float32)
    arr = np.stack(
        [np.tile(x, (48, 1))] * 3, axis=-1
    ).astype(np.uint8)
    data = make_jpeg_bytes(arr)
    ours = decode_jpeg_native(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert ours.shape == ref.shape
    # same decoder library: should match within small tolerance
    assert np.abs(ours.astype(int) - ref.astype(int)).mean() < 2.0


def test_resize_matches_pil_closely():
    rng = np.random.RandomState(1)
    arr = (rng.rand(40, 60, 3) * 255).astype(np.uint8)
    ours = resize_bilinear_native(arr, (20, 30))
    ref = np.asarray(
        Image.fromarray(arr).resize((30, 20), Image.BILINEAR)
    )
    assert ours.shape == ref.shape
    assert np.abs(ours.astype(int) - ref.astype(int)).mean() < 4.0


def test_load_image_rgb(tmp_path):
    arr = np.zeros((16, 16, 3), np.uint8) + 128
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p)
    out = load_image_rgb(str(p))
    # uint8 end-to-end: Normalize does the single float conversion
    assert out.dtype == np.uint8
    assert out.shape == (16, 16, 3)
    assert abs(out.mean() - 128) < 4
