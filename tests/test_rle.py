import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.utils.rle import (
    coco_segmentation_to_mask,
    compress_counts,
    counts_to_mask,
    decode_rle,
    decompress_counts,
    encode_mask,
    mask_to_counts,
    merge_rles,
    polygons_to_mask,
    rle_area,
    rle_iou,
    rle_iou_matrix,
)


def random_mask(rng, h=37, w=53, p=0.3):
    return (rng.rand(h, w) < p).astype(np.uint8)


def test_counts_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(10):
        m = random_mask(rng)
        counts = mask_to_counts(m)
        np.testing.assert_array_equal(counts_to_mask(counts, *m.shape), m)


def test_compressed_roundtrip():
    rng = np.random.RandomState(1)
    for _ in range(10):
        m = random_mask(rng, 64, 48)
        rle = encode_mask(m)
        assert isinstance(rle["counts"], str)
        np.testing.assert_array_equal(decode_rle(rle), m)


def test_compression_spec_known_value():
    # A 3x3 mask with a single pixel at (0, 0): counts = [0, 1, 8]
    m = np.zeros((3, 3), np.uint8)
    m[0, 0] = 1
    counts = mask_to_counts(m)
    np.testing.assert_array_equal(counts, [0, 1, 8])
    s = compress_counts(counts)
    assert decompress_counts(s) == [0, 1, 8]


def test_compression_pycocotools_interop_vector():
    """Ground-truth vector pinning the maskApi.c convention: deltas
    start at index 3 (`if(i>2) x-=cnts[i-2]`), the first THREE counts
    raw.  Hand-derived per rleToString's 6-bit LEB scheme:
      [5, 10, 20, 7, 30, 8] -> raw stream [5, 10, 20, -3, 10, 1]
      5->'5', 10->':', 20->'d0' (0x10 bit forces a continuation
      chunk), -3->'M' (sign-extended), 10->':', 1->'1'.
    An index-2 delta start (the common mis-port) would emit 15 for the
    third count and fail both directions — internal round-trip tests
    cannot catch that, only a fixed vector can."""
    counts = [5, 10, 20, 7, 30, 8]
    assert compress_counts(counts) == "5:d0M:1"
    assert decompress_counts("5:d0M:1") == counts


def test_decompress_truncated_string_raises():
    """A counts string cut mid-value (final chunk's continuation bit
    still set) must raise, not silently decode a wrong trailing count
    ('d0' is one 20-valued group: dropping its last chunk leaves the
    continuation chunk 'd' dangling)."""
    import pytest

    with pytest.raises(ValueError):
        decompress_counts("5:d")


def test_area_and_iou():
    a = np.zeros((10, 10), np.uint8)
    a[:5, :] = 1
    b = np.zeros((10, 10), np.uint8)
    b[3:8, :] = 1
    ra, rb = encode_mask(a), encode_mask(b)
    assert rle_area(ra) == 50
    np.testing.assert_allclose(rle_iou(ra, rb), 20.0 / 80.0)
    # crowd: intersection over dt area
    np.testing.assert_allclose(rle_iou(ra, rb, is_crowd=True), 20.0 / 50.0)
    m = rle_iou_matrix([ra, rb], [ra, rb], [False, False])
    np.testing.assert_allclose(np.diag(m), [1.0, 1.0])


def test_merge():
    a = np.zeros((6, 6), np.uint8)
    a[:3] = 1
    b = np.zeros((6, 6), np.uint8)
    b[3:] = 1
    merged = decode_rle(merge_rles([encode_mask(a), encode_mask(b)]))
    assert merged.all()


def test_polygon_rasterization():
    # axis-aligned square from (2,2) to (7,7)
    poly = [[2, 2, 7, 2, 7, 7, 2, 7]]
    m = polygons_to_mask(poly, 10, 10)
    assert m[4, 4] == 1
    assert m[0, 0] == 0 and m[9, 9] == 0
    assert m.sum() >= 25  # inclusive rasterization


def test_segmentation_dispatch():
    seg_poly = [[1, 1, 4, 1, 4, 4, 1, 4]]
    m1 = coco_segmentation_to_mask(seg_poly, 6, 6)
    assert m1.sum() > 0
    seg_rle_unc = {"size": [6, 6], "counts": mask_to_counts(m1).tolist()}
    np.testing.assert_array_equal(coco_segmentation_to_mask(seg_rle_unc, 6, 6), m1)
    seg_rle_c = encode_mask(m1)
    np.testing.assert_array_equal(
        coco_segmentation_to_mask(seg_rle_c, 6, 6), m1
    )


def test_large_runs():
    # runs > 2^15 exercise multi-chunk LEB encoding
    m = np.zeros((500, 400), np.uint8)
    m[:, 200:] = 1
    rle = encode_mask(m)
    np.testing.assert_array_equal(decode_rle(rle), m)
