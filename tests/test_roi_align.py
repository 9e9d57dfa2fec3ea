import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.ops import roi_align


def np_roi_align(features, rois, pooled, scale, sampling_ratio):
    """Direct numpy transcription of ROIAlignForward_cpu_kernel
    (maskrcnn_benchmark/csrc/cpu/ROIAlign_cpu.cpp:16-180), NHWC."""
    B, H, W, C = features.shape
    P = Q = pooled
    out = np.zeros((len(rois), P, Q, C), np.float32)
    for n, roi in enumerate(rois):
        b = int(roi[0])
        x1, y1, x2, y2 = roi[1:] * scale
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_w = roi_w / Q
        bin_h = roi_h / P
        gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(roi_h / P))
        gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(roi_w / Q))
        count = gh * gw
        for ph in range(P):
            for pw in range(Q):
                acc = np.zeros(C, np.float32)
                for iy in range(gh):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / gh
                    for ix in range(gw):
                        xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / gw
                        x, y = xx, yy
                        if y < -1.0 or y > H or x < -1.0 or x > W:
                            continue
                        y = max(y, 0.0)
                        x = max(x, 0.0)
                        y_lo, x_lo = int(y), int(x)
                        if y_lo >= H - 1:
                            y_hi = y_lo = H - 1
                            y = float(y_lo)
                        else:
                            y_hi = y_lo + 1
                        if x_lo >= W - 1:
                            x_hi = x_lo = W - 1
                            x = float(x_lo)
                        else:
                            x_hi = x_lo + 1
                        ly, lx = y - y_lo, x - x_lo
                        hy, hx = 1 - ly, 1 - lx
                        acc += (
                            hy * hx * features[b, y_lo, x_lo]
                            + hy * lx * features[b, y_lo, x_hi]
                            + ly * hx * features[b, y_hi, x_lo]
                            + ly * lx * features[b, y_hi, x_hi]
                        )
                out[n, ph, pw] = acc / count
    return out


def test_roi_align_matches_reference_adaptive():
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 25, 32, 8).astype(np.float32)
    rois = np.array(
        [
            [0, 10.3, 15.7, 200.2, 300.9],
            [1, 0.0, 0.0, 511.0, 399.0],
            [0, 100.0, 50.0, 120.0, 70.0],
            [1, 5.0, 5.0, 6.0, 6.0],  # tiny roi -> forced 1x1 grid
        ],
        np.float32,
    )
    ref = np_roi_align(feats, rois, 7, 1.0 / 16, 0)
    ours = roi_align(
        jnp.asarray(feats), jnp.asarray(rois), (7, 7), 1.0 / 16, 0,
        roi_chunk=2,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_roi_align_matches_reference_fixed_ratio():
    rng = np.random.RandomState(1)
    feats = rng.randn(1, 16, 16, 4).astype(np.float32)
    rois = np.array([[0, 12.0, 8.0, 180.0, 150.0]], np.float32)
    ref = np_roi_align(feats, rois, 14, 1.0 / 16, 2)
    ours = roi_align(
        jnp.asarray(feats), jnp.asarray(rois), (14, 14), 1.0 / 16, 2
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_roi_align_out_of_bounds_roi():
    feats = np.ones((1, 10, 10, 1), np.float32)
    # roi partially outside the feature map (grid stays under the cap)
    rois = np.array([[0, -8.0, -8.0, 6.0, 6.0]], np.float32)
    ref = np_roi_align(feats, rois, 4, 1.0, 0)
    ours = roi_align(jnp.asarray(feats), jnp.asarray(rois), (4, 4), 1.0, 0)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_roi_align_differentiable():
    import jax

    feats = jnp.ones((1, 8, 8, 2))
    rois = jnp.array([[0, 1.0, 1.0, 6.0, 6.0]])

    def f(x):
        return jnp.sum(roi_align(x, rois, (2, 2), 1.0, 2))

    g = jax.grad(f)(feats)
    assert g.shape == feats.shape
    assert float(jnp.sum(g)) > 0
