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
    # out-of-range samples are skipped and the average renormalized by
    # the in-range count (kernel top_count), so constant features pool
    # to exactly 1 everywhere
    np.testing.assert_allclose(np.asarray(out)[0], 1.0, atol=1e-5)
    # with offsets pushing every sample far out of bounds, count == 0
    # and the kernel writes 0
    off = jnp.full((1, 7, 7, 2), 50.0)
    out2 = deform_psroi_pool(feats, rois, off, 7, 1.0 / 16, trans_std=1.0)
    assert float(out2.mean()) < 1.0


def _golden_deform_psroi_pool(
    feats, rois, trans, P, scale, s, trans_std, gs
):
    """Direct numpy transcription of the reference kernel's math
    (csrc/cuda/deform_pool_kernel_cuda.cu:54-141), loops and all, as a
    test oracle.  feats [B,H,W,C] channels-last; trans [R,P,P,2] as
    (dy, dx) or None; part_size == P, num_classes == 1."""
    B, H, W, C = feats.shape
    out_dim = C // (gs * gs)
    R = rois.shape[0]
    out = np.zeros((R, P, P, out_dim), np.float64)

    def rnd(v):  # C round(): half away from zero
        return np.floor(np.abs(v) + 0.5) * np.sign(v)

    for n in range(R):
        b = int(rois[n, 0])
        start_w = rnd(rois[n, 1]) * scale - 0.5
        start_h = rnd(rois[n, 2]) * scale - 0.5
        end_w = (rnd(rois[n, 3]) + 1.0) * scale - 0.5
        end_h = (rnd(rois[n, 4]) + 1.0) * scale - 0.5
        roi_w = max(end_w - start_w, 0.1)
        roi_h = max(end_h - start_h, 0.1)
        bin_w, bin_h = roi_w / P, roi_h / P
        sub_w, sub_h = bin_w / s, bin_h / s
        for ph in range(P):
            for pw in range(P):
                ty = 0.0 if trans is None else trans[n, ph, pw, 0] * trans_std
                tx = 0.0 if trans is None else trans[n, ph, pw, 1] * trans_std
                hstart = ph * bin_h + start_h + ty * roi_h
                wstart = pw * bin_w + start_w + tx * roi_w
                gh = min(max(int(np.floor(ph * gs / P)), 0), gs - 1)
                gw = min(max(int(np.floor(pw * gs / P)), 0), gs - 1)
                for ctop in range(out_dim):
                    c = (ctop * gs + gh) * gs + gw
                    acc, cnt = 0.0, 0
                    for ih in range(s):
                        for iw in range(s):
                            w = wstart + iw * sub_w
                            h = hstart + ih * sub_h
                            if w < -0.5 or w > W - 0.5 or h < -0.5 or h > H - 0.5:
                                continue
                            w = min(max(w, 0.0), W - 1.0)
                            h = min(max(h, 0.0), H - 1.0)
                            x0, x1 = int(np.floor(w)), int(np.ceil(w))
                            y0, y1 = int(np.floor(h)), int(np.ceil(h))
                            dx, dy = w - x0, h - y0
                            acc += (
                                (1 - dx) * (1 - dy) * feats[b, y0, x0, c]
                                + (1 - dx) * dy * feats[b, y1, x0, c]
                                + dx * (1 - dy) * feats[b, y0, x1, c]
                                + dx * dy * feats[b, y1, x1, c]
                            )
                            cnt += 1
                    out[n, ph, pw, ctop] = acc / cnt if cnt else 0.0
    return out


def test_deform_psroi_pool_matches_reference_kernel_math():
    """Random-input parity with the loop transcription of the reference
    CUDA kernel: roi rounding, non-centered samples, count
    normalization, and (gs=2) position-sensitive channel selection."""
    rng = np.random.RandomState(7)
    feats = rng.randn(2, 12, 10, 8).astype(np.float32)
    rois = np.stack(
        [
            np.array([0, 3.2, 4.9, 100.0, 140.0]),
            np.array([1, 0.0, 0.0, 30.5, 22.4]),
            np.array([0, 150.0, 150.0, 190.0, 170.0]),  # partly outside
        ]
    ).astype(np.float32)
    for gs in (1, 2):
        for with_off in (False, True):
            P = 7
            off = (
                rng.randn(3, P, P, 2).astype(np.float32)
                if with_off
                else None
            )
            got = deform_psroi_pool(
                jnp.asarray(feats), jnp.asarray(rois),
                None if off is None else jnp.asarray(off),
                P, 1.0 / 16, sampling_ratio=4, trans_std=0.1,
                group_size=gs,
            )
            want = _golden_deform_psroi_pool(
                feats, rois, off, P, 1.0 / 16, 4, 0.1, gs
            )
            np.testing.assert_allclose(
                np.asarray(got), want, atol=1e-4,
                err_msg=f"gs={gs} with_off={with_off}",
            )


def test_deform_conv_groups_matches_grouped_conv():
    """groups=2 with zero offsets must equal lax grouped convolution."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 6), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 4), jnp.float32)  # cin/g=3, cout=4
    offsets = jnp.zeros((1, 8, 8, 18))
    out = deform_conv2d(x, offsets, w, stride=1, padding=1, groups=2)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=2,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4
    )


def test_deform_conv_group_mismatch_raises():
    x = jnp.zeros((1, 4, 4, 6))
    w = jnp.zeros((3, 3, 4, 4))  # wrong cin/g for groups=2
    offsets = jnp.zeros((1, 4, 4, 18))
    import pytest

    with pytest.raises(ValueError, match="grouped deform conv"):
        deform_conv2d(x, offsets, w, groups=2)
