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
