"""Deformable convolution v1/v2 and deformable PSRoI pooling.

TPU re-designs of the reference CUDA kernels
(reference: maskrcnn_benchmark/csrc/cuda/deform_conv_cuda.cu +
deform_conv_kernel_cuda.cu — im2col with per-tap learned offsets;
csrc/cuda/deform_pool_cuda.cu).  Parity components: enabled by
MODEL.RESNETS.STAGE_WITH_DCN / WITH_MODULATED_DCN (defaults.py:384),
off in all shipped configs.

Formulation: deformable im2col = bilinear sampling of the input at
(base tap position + learned offset) -> a dense [.., K*K*Cin] patch
tensor -> one matmul with the kernel (MXU).  The modulated (v2) variant
multiplies each sampled tap by a learned scalar mask.  Gradients via
XLA autodiff of the gather formulation (replacing the three handwritten
backward kernels).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample_nhwc(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """x [H, W, C]; ys/xs [...]; zero padding outside. Returns [..., C]."""
    h, w, _ = x.shape
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    ly = ys - y0
    lx = xs - x0

    def tap(yi, xi, wgt):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = x[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return v * (wgt * inside)[..., None]

    return (
        tap(y0, x0, (1 - ly) * (1 - lx))
        + tap(y0, x0 + 1, (1 - ly) * lx)
        + tap(y0 + 1, x0, ly * (1 - lx))
        + tap(y0 + 1, x0 + 1, ly * lx)
    )


def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Deformable conv (v2 when ``mask`` given).

    x [B, H, W, Cin]; offsets [B, Ho, Wo, 2*K*K] as (dy, dx) per tap;
    weight [K, K, Cin, Cout]; mask [B, Ho, Wo, K*K] (v2 modulation).
    Single deformable group (groups split channel-wise by callers).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    n_taps = kh * kw

    oy = jnp.arange(ho) * stride - padding
    ox = jnp.arange(wo) * stride - padding
    tap_y = jnp.repeat(jnp.arange(kh) * dilation, kw)  # [K*K]
    tap_x = jnp.tile(jnp.arange(kw) * dilation, kh)  # [K*K]
    # base positions broadcast to [Ho, Wo, K*K]
    base_y = oy[:, None, None] + tap_y[None, None, :]
    base_x = ox[None, :, None] + tap_x[None, None, :]

    off = offsets.reshape(b, ho, wo, n_taps, 2)

    def per_image(xi, offi, maski):
        ys = base_y + offi[..., 0]
        xs = base_x + offi[..., 1]
        patches = _bilinear_sample_nhwc(xi, ys, xs)  # [Ho, Wo, KK, Cin]
        if maski is not None:
            patches = patches * maski[..., None]
        flat = patches.reshape(ho, wo, n_taps * cin)
        out = jnp.einsum(
            "hwk,ko->hwo",
            flat,
            weight.reshape(n_taps * cin, cout),
            preferred_element_type=jnp.float32,
        )
        return out.astype(x.dtype)

    if mask is None:
        out = jax.vmap(lambda xi, offi: per_image(xi, offi, None))(x, off)
    else:
        m = mask.reshape(b, ho, wo, n_taps)
        out = jax.vmap(per_image)(x, off, m)
    if bias is not None:
        out = out + bias
    return out


def deform_psroi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    offsets: Optional[jnp.ndarray],
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 2,
    trans_std: float = 0.1,
) -> jnp.ndarray:
    """Deformable (modulated) position-sensitive RoI pooling
    (csrc/deform_pool.h).  features [B, H, W, C]; rois [R, 5]
    (batch, x1, y1, x2, y2); offsets [R, P, P, 2] normalized part
    offsets or None (plain PSRoI average pooling).

    Returns [R, P, P, C].
    """
    p = output_size
    bsz, h, w, c = features.shape
    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale - 0.5
    y1 = rois[:, 2] * spatial_scale - 0.5
    x2 = rois[:, 3] * spatial_scale + 0.5
    y2 = rois[:, 4] * spatial_scale + 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    bin_w = roi_w / p
    bin_h = roi_h / p

    s = sampling_ratio
    py = jnp.arange(p)
    px = jnp.arange(p)
    sy = (jnp.arange(s) + 0.5) / s
    sx = (jnp.arange(s) + 0.5) / s

    def per_roi(bi, xx1, yy1, bw, bh, rw, rh, off):
        # per-bin sample grid [P, P, S, S]
        ys = (
            yy1
            + (py[:, None] + 0 * px[None, :])[..., None, None] * bh
            + sy[None, None, :, None] * bh
        )
        xs = (
            xx1
            + (0 * py[:, None] + px[None, :])[..., None, None] * bw
            + sx[None, None, None, :] * bw
        )
        if off is not None:
            ys = ys + (off[..., 0] * trans_std * rh)[..., None, None]
            xs = xs + (off[..., 1] * trans_std * rw)[..., None, None]
        vals = _bilinear_sample_nhwc(
            features[bi], ys, xs
        )  # [P, P, S, S, C]
        return jnp.mean(vals, axis=(2, 3))

    if offsets is None:
        return jax.vmap(
            lambda bi, a, b_, c_, d_, e_, f_: per_roi(
                bi, a, b_, c_, d_, e_, f_, None
            )
        )(batch_idx, x1, y1, bin_w, bin_h, roi_w, roi_h)
    return jax.vmap(per_roi)(
        batch_idx, x1, y1, bin_w, bin_h, roi_w, roi_h, offsets
    )
