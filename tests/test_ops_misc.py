import jax.numpy as jnp
import numpy as np
import torch

from cvpr22_cross_modal_pseudo_labeling_tpu.ops import (
    crop_resize_from_box_frame,
    paste_masks_np,
    roi_pool,
    sigmoid_focal_loss,
    smooth_l1_loss,
)


def test_sigmoid_focal_loss_matches_reference_cpu():
    """Golden test against the reference's own CPU fallback formula
    (maskrcnn_benchmark/layers/sigmoid_focal_loss.py:40-50), transcribed
    in torch here."""
    rng = np.random.RandomState(0)
    logits = rng.randn(32, 10).astype(np.float32)
    targets = rng.randint(0, 11, 32).astype(np.int32)

    t_logits = torch.tensor(logits)
    t_targets = torch.tensor(targets)
    class_range = torch.arange(1, 11, dtype=t_targets.dtype).unsqueeze(0)
    t = t_targets.unsqueeze(1)
    p = torch.sigmoid(t_logits)
    gamma, alpha = 2.0, 0.25
    term1 = (1 - p) ** gamma * torch.log(p)
    term2 = p**gamma * torch.log(1 - p)
    ref = (
        -(t == class_range).float() * term1 * alpha
        - ((t != class_range) * (t >= 0)).float() * term2 * (1 - alpha)
    ).numpy()

    ours = sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), gamma, alpha
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_smooth_l1():
    pred = jnp.array([0.0, 0.05, 1.0])
    tgt = jnp.zeros(3)
    beta = 1.0 / 9
    out = np.asarray(smooth_l1_loss(pred, tgt, beta))
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[1], 0.5 * 0.05**2 / beta, atol=1e-6)
    np.testing.assert_allclose(out[2], 1.0 - 0.5 * beta, atol=1e-6)


def test_roi_pool_simple_max():
    # 4x4 single-channel map, roi covering all; 2x2 pooling = block maxes
    f = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    rois = np.array([[0, 0.0, 0.0, 3.0, 3.0]], np.float32)
    out = roi_pool(jnp.asarray(f), jnp.asarray(rois), (2, 2), 1.0)
    np.testing.assert_allclose(
        np.asarray(out)[0, :, :, 0], [[5.0, 7.0], [13.0, 15.0]]
    )


def test_roi_pool_rounds_half_away_from_zero():
    """CUDA round() is half-away-from-zero: coord 8 at scale 1/16 maps
    to cell 1 (0.5 -> 1), where jnp.round's half-to-even gives cell 0.
    (ROIPool_cuda.cu:30-33)."""
    f = np.zeros((1, 4, 4, 1), np.float32)
    for y in range(4):
        for x in range(4):
            f[0, y, x, 0] = 10 * y + x
    rois = np.array([[0, 8.0, 8.0, 8.0, 8.0]], np.float32)
    out = roi_pool(jnp.asarray(f), jnp.asarray(rois), (1, 1), 1.0 / 16)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], 11.0)


def test_nms_output_capacity_exceeds_input():
    """max-output capacity larger than the padded input still yields
    the documented static shapes (padded with invalid slots)."""
    from cvpr22_cross_modal_pseudo_labeling_tpu.ops.nms import nms

    rng = np.random.RandomState(5)
    n = 10
    boxes = np.abs(rng.randn(n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + 5.0
    idx, keep = nms(
        jnp.asarray(boxes),
        jnp.asarray(rng.rand(n).astype(np.float32)),
        jnp.ones(n, bool),
        0.5,
        max_outputs=300,
        tile=64,
    )
    assert idx.shape == (300,)
    assert keep.shape == (300,)
    assert not bool(np.asarray(keep)[n:].any())


def test_crop_resize_identity():
    rng = np.random.RandomState(0)
    mask = rng.rand(28, 28).astype(np.float32)
    box = jnp.array([10.0, 20.0, 37.0, 47.0])
    out = crop_resize_from_box_frame(jnp.asarray(mask), box, box, (28, 28))
    np.testing.assert_allclose(np.asarray(out), mask, atol=1e-5)


def test_crop_resize_shifted_crop():
    # constant mask stays constant under any crop fully inside
    mask = jnp.ones((28, 28))
    src = jnp.array([0.0, 0.0, 99.0, 99.0])
    dst = jnp.array([25.0, 25.0, 49.0, 49.0])
    out = crop_resize_from_box_frame(mask, src, dst, (14, 14))
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_paste_masks_np_roundtrip():
    # A solid mask pasted into its box covers (roughly) the box extent
    masks = np.ones((1, 28, 28), np.float32)
    boxes = np.array([[10, 10, 30, 40]], np.float32)
    out = paste_masks_np(masks, boxes, (60, 60))
    assert out.shape == (1, 60, 60)
    # interior of the box is filled
    assert out[0, 25, 20] == 1
    # far outside is empty
    assert out[0, 5, 5] == 0 and out[0, 55, 55] == 0


def _sample_bilinear_golden(mask, ys, xs):
    """Gather-formulation bilinear sampler (align_corners=False,
    out-of-range taps contribute zero, indices clamp) — the golden
    reference for ops/masks._axis_tap_matrix's matmul formulation."""
    import numpy as np

    h, w = mask.shape
    y0 = np.floor(ys).astype(np.int32)
    x0 = np.floor(xs).astype(np.int32)
    ly, lx = ys - y0, xs - x0
    y0c, y1c = np.clip(y0, 0, h - 1), np.clip(y0 + 1, 0, h - 1)
    x0c, x1c = np.clip(x0, 0, w - 1), np.clip(x0 + 1, 0, w - 1)
    wy0 = np.where((y0 >= 0) & (y0 <= h - 1), 1.0 - ly, 0.0)
    wy1 = np.where((y0 + 1 >= 0) & (y0 + 1 <= h - 1), ly, 0.0)
    wx0 = np.where((x0 >= 0) & (x0 <= w - 1), 1.0 - lx, 0.0)
    wx1 = np.where((x0 + 1 >= 0) & (x0 + 1 <= w - 1), lx, 0.0)
    return (
        wy0[:, None] * wx0[None, :] * mask[y0c[:, None], x0c[None, :]]
        + wy0[:, None] * wx1[None, :] * mask[y0c[:, None], x1c[None, :]]
        + wy1[:, None] * wx0[None, :] * mask[y1c[:, None], x0c[None, :]]
        + wy1[:, None] * wx1[None, :] * mask[y1c[:, None], x1c[None, :]]
    )


def test_axis_tap_matrix_matches_gather_golden():
    import numpy as np

    from cvpr22_cross_modal_pseudo_labeling_tpu.ops.masks import (
        _axis_tap_matrix,
    )

    rng = np.random.RandomState(3)
    mask = rng.rand(9, 7).astype(np.float32)
    ys = np.linspace(-1.2, 9.7, 13)  # includes out-of-range taps
    xs = np.linspace(-0.8, 7.4, 11)
    golden = _sample_bilinear_golden(mask, ys, xs)
    w_y = np.asarray(_axis_tap_matrix(ys, 9))
    w_x = np.asarray(_axis_tap_matrix(xs, 7))
    np.testing.assert_allclose(w_y @ mask @ w_x.T, golden, atol=1e-5)


def test_paste_mask_box_local_padding_zero():
    """padding=0 must paste the probs, not an all-zero buffer (the
    `[0:-0]` empty-slice pitfall)."""
    import numpy as np

    from cvpr22_cross_modal_pseudo_labeling_tpu.ops.masks import (
        paste_mask_box_local,
    )

    probs = np.full((8, 8), 0.9, np.float32)
    box = np.array([4.0, 4.0, 19.0, 19.0])
    out = paste_mask_box_local(probs, box, (32, 32), padding=0)
    assert out is not None
    binar, x0, y0 = out
    assert binar.sum() > 100, "padding=0 pasted an empty mask"


def test_roi_pool_large_bins_full_coverage():
    """Bins larger than the old 16-px scan cap must still see every
    pixel: the max here lives in the LAST row/col of a ~32-px bin."""
    import numpy as np

    from cvpr22_cross_modal_pseudo_labeling_tpu.ops.roi_pool import roi_pool

    H = W = 64
    feats = np.zeros((1, H, W, 1), np.float32)
    feats[0, 31, 31, 0] = 7.0  # last pixel of bin (0, 0) at P=Q=2
    feats[0, 63, 63, 0] = 9.0  # last pixel of bin (1, 1)
    rois = np.array([[0, 0, 0, 63, 63]], np.float32)
    out = np.asarray(
        roi_pool(feats, rois, output_size=(2, 2), spatial_scale=1.0)
    )
    assert out[0, 0, 0, 0] == 7.0
    assert out[0, 1, 1, 0] == 9.0
