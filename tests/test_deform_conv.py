import jax
import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.ops.deform_conv import (
    deform_conv2d,
    deform_psroi_pool,
)


def test_zero_offset_equals_regular_conv():
    """With zero offsets, deformable conv must equal a standard conv."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 5), jnp.float32)
    offsets = jnp.zeros((1, 8, 8, 2 * 9))
    out = deform_conv2d(x, offsets, w, stride=1, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_integer_offset_shifts_sampling():
    """An integer (dy=0, dx=1) offset equals sampling the shifted input."""
    rng = np.random.RandomState(1)
    x = np.zeros((1, 6, 6, 1), np.float32)
    x[0, :, :, 0] = rng.randn(6, 6)
    w = np.zeros((1, 1, 1, 1), np.float32)
    w[0, 0, 0, 0] = 1.0
    offsets = np.zeros((1, 6, 6, 2))
    offsets[..., 1] = 1.0  # dx = +1
    out = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(w),
        stride=1, padding=0,
    )
    # output[y, x] = input[y, x+1]; last column samples out of bounds -> 0
    np.testing.assert_allclose(
        np.asarray(out)[0, :, :-1, 0], x[0, :, 1:, 0], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out)[0, :, -1, 0], 0.0)


def test_modulated_mask_scales():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 2, 2), jnp.float32)
    offsets = jnp.zeros((1, 4, 4, 18))
    full = deform_conv2d(x, offsets, w, mask=jnp.ones((1, 4, 4, 9)))
    half = deform_conv2d(
        x, offsets, w, mask=jnp.full((1, 4, 4, 9), 0.5)
    )
    np.testing.assert_allclose(
        np.asarray(half), np.asarray(full) * 0.5, atol=1e-5
    )


def test_deform_psroi_pool_constant():
    feats = jnp.ones((1, 16, 16, 4))
    rois = jnp.array([[0, 0.0, 0.0, 120.0, 120.0]])
    out = deform_psroi_pool(feats, rois, None, 7, 1.0 / 16)
    assert out.shape == (1, 7, 7, 4)
    # interior bins average constant features exactly; edge bins sample
    # past the border (the -0.5 roi alignment) and dip slightly
    np.testing.assert_allclose(np.asarray(out)[0, 1:, 1:], 1.0, atol=1e-5)
    assert float(out.min()) > 0.5
    # with offsets pushing samples far out of bounds, values drop
    off = jnp.full((1, 7, 7, 2), 50.0)
    out2 = deform_psroi_pool(feats, rois, off, 7, 1.0 / 16, trans_std=1.0)
    assert float(out2.mean()) < 1.0
