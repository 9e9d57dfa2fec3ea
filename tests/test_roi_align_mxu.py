import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.ops.roi_align_mxu import (
    roi_align_mxu,
)
from tests.test_roi_align import np_roi_align


def test_mxu_matches_reference_adaptive():
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 25, 32, 8).astype(np.float32)
    rois = np.array(
        [
            [[10.3, 15.7, 200.2, 300.9], [100.0, 50.0, 120.0, 70.0]],
            [[0.0, 0.0, 511.0, 399.0], [5.0, 5.0, 6.0, 6.0]],
        ],
        np.float32,
    )
    # flatten to the reference's [batch_idx, ...] layout for the golden fn
    flat_rois = np.concatenate(
        [
            np.repeat(np.arange(2), 2)[:, None],
            rois.reshape(-1, 4),
        ],
        axis=1,
    ).astype(np.float32)
    ref = np_roi_align(feats, flat_rois, 7, 1.0 / 16, 0)
    ours = roi_align_mxu(
        jnp.asarray(feats), jnp.asarray(rois), (7, 7), 1.0 / 16, 0,
        roi_chunk=2,
    )
    np.testing.assert_allclose(
        np.asarray(ours).reshape(-1, 7, 7, 8), ref, atol=1e-4
    )


def test_mxu_matches_reference_fixed_ratio():
    rng = np.random.RandomState(1)
    feats = rng.randn(1, 16, 16, 4).astype(np.float32)
    rois = np.array([[[12.0, 8.0, 180.0, 150.0]]], np.float32)
    flat = np.array([[0, 12.0, 8.0, 180.0, 150.0]], np.float32)
    ref = np_roi_align(feats, flat, 14, 1.0 / 16, 2)
    ours = roi_align_mxu(
        jnp.asarray(feats), jnp.asarray(rois), (14, 14), 1.0 / 16, 2
    )
    np.testing.assert_allclose(np.asarray(ours)[0], ref, atol=1e-4)


def test_mxu_out_of_bounds_roi():
    feats = np.ones((1, 10, 10, 1), np.float32)
    rois = np.array([[[-8.0, -8.0, 6.0, 6.0]]], np.float32)
    flat = np.array([[0, -8.0, -8.0, 6.0, 6.0]], np.float32)
    ref = np_roi_align(feats, flat, 4, 1.0, 0)
    ours = roi_align_mxu(jnp.asarray(feats), jnp.asarray(rois), (4, 4), 1.0, 0)
    np.testing.assert_allclose(np.asarray(ours)[0], ref, atol=1e-5)


def test_mxu_differentiable():
    import jax

    feats = jnp.ones((1, 8, 8, 2))
    rois = jnp.array([[[1.0, 1.0, 6.0, 6.0]]])

    def f(x):
        return jnp.sum(roi_align_mxu(x, rois, (2, 2), 1.0, 2))

    g = jax.grad(f)(feats)
    assert float(jnp.sum(g)) > 0
