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
    groups: int = 1,
) -> jnp.ndarray:
    """Deformable conv (v2 when ``mask`` given).

    x [B, H, W, Cin]; offsets [B, Ho, Wo, 2*K*K] as (dy, dx) per tap;
    weight [K, K, Cin // groups, Cout]; mask [B, Ho, Wo, K*K]
    (v2 modulation).  ``groups`` is the channel group count of the
    convolution (reference DFConv2d groups=num_groups for ResNeXt,
    layers/misc.py:170): input channels are split into contiguous
    blocks, output block g reads only input block g.  Single
    deformable group (all channels share the tap offsets, matching
    the reference's deformable_groups=1 config default).
    """
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    if cin_g * groups != cin or cout % groups:
        raise ValueError(
            f"grouped deform conv mismatch: x has {cin} channels, weight "
            f"[{kh},{kw},{cin_g},{cout}] with groups={groups}"
        )
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
        if groups == 1:
            out = jnp.einsum(
                "hwk,ko->hwo",
                patches.reshape(ho, wo, n_taps * cin),
                weight.reshape(n_taps * cin, cout),
                preferred_element_type=jnp.float32,
            )
        else:
            # channel groups are contiguous blocks of the input; output
            # block g contracts only against input block g
            pg = patches.reshape(ho, wo, n_taps, groups, cin // groups)
            pg = pg.transpose(0, 1, 3, 2, 4).reshape(
                ho, wo, groups, n_taps * (cin // groups)
            )
            wg = weight.reshape(
                n_taps * (cin // groups), groups, cout // groups
            ).transpose(1, 0, 2)
            out = jnp.einsum(
                "hwgk,gko->hwgo", pg, wg,
                preferred_element_type=jnp.float32,
            ).reshape(ho, wo, cout)
        return out.astype(x.dtype)

    if mask is None:
        out = jax.vmap(lambda xi, offi: per_image(xi, offi, None))(x, off)
    else:
        m = mask.reshape(b, ho, wo, n_taps)
        out = jax.vmap(per_image)(x, off, m)
    if bias is not None:
        out = out + bias
    return out


def _round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """C round(): halves away from zero (jnp.round is half-to-even)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def deform_psroi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    offsets: Optional[jnp.ndarray],
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 4,
    trans_std: float = 0.1,
    group_size: int = 1,
) -> jnp.ndarray:
    """Deformable position-sensitive RoI pooling, matching the
    reference DeformablePSROIPoolForwardKernel
    (csrc/cuda/deform_pool_kernel_cuda.cu:54-141) point for point:

    - roi interval: ``round(x1)*scale - 0.5`` .. ``(round(x2)+1)*scale
      - 0.5`` with C round() (half away from zero), floored at 0.1;
    - sub-bin samples at ``start + i*sub_bin`` for i in [0, S)
      (NOT center-offset), skipped when outside (-0.5, dim-0.5),
      clamped into [0, dim-1], averaged over the count of in-range
      samples (0 when none land in-image);
    - position-sensitive channel ``(ctop*gs + gh)*gs + gw`` with
      ``gh = clip(floor(ph*gs/P))`` — ``output_dim = C / gs**2``;
    - class-agnostic part offsets (num_classes=1, the
      DeformRoIPoolingPack layout, deform_pool_module.py:82-87) scaled
      by ``trans_std * roi_size``; ``part_size == output_size``
      (part_h == ph), the reference module default.

    features [B, H, W, C]; rois [R, 5] (batch, x1, y1, x2, y2);
    offsets [R, P, P, 2] as (dy, dx) normalized part offsets, or None
    (no_trans).  Returns [R, P, P, C // group_size**2].

    Gradients via autodiff of this formulation: the sample count and
    the position-sensitive selection are piecewise constant (zero
    gradient), matching the reference backward's saved top_count.
    """
    p = output_size
    gs = group_size
    bsz, h, w, c = features.shape
    if c % (gs * gs):
        raise ValueError(f"{c} channels not divisible by group_size^2={gs*gs}")
    out_dim = c // (gs * gs)
    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = _round_half_away(rois[:, 1]) * spatial_scale - 0.5
    y1 = _round_half_away(rois[:, 2]) * spatial_scale - 0.5
    x2 = (_round_half_away(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    y2 = (_round_half_away(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    bin_w = roi_w / p
    bin_h = roi_h / p

    s = sampling_ratio
    py = jnp.arange(p, dtype=features.dtype)
    px = jnp.arange(p, dtype=features.dtype)
    si = jnp.arange(s, dtype=features.dtype) / s  # sub-bin fractions
    # per-bin position-sensitive group index [P]
    gh = jnp.clip((jnp.arange(p) * gs) // p, 0, gs - 1)

    def per_roi(bi, xx1, yy1, bw, bh, rw, rh, off):
        # bin starts [P, P]
        hstart = yy1 + py[:, None] * bh + 0.0 * px[None, :]
        wstart = xx1 + 0.0 * py[:, None] + px[None, :] * bw
        if off is not None:
            hstart = hstart + off[..., 0] * trans_std * rh
            wstart = wstart + off[..., 1] * trans_std * rw
        # sample grid [P, P, S, S]
        ys = hstart[..., None, None] + si[None, None, :, None] * bh
        xs = wstart[..., None, None] + si[None, None, None, :] * bw
        in_range = (
            (ys >= -0.5) & (ys <= h - 0.5) & (xs >= -0.5) & (xs <= w - 0.5)
        )
        ys = jnp.clip(ys, 0.0, h - 1.0)
        xs = jnp.clip(xs, 0.0, w - 1.0)
        vals = _bilinear_sample_nhwc(features[bi], ys, xs)  # [P,P,S,S,C]
        vals = vals * in_range[..., None]
        cnt = jnp.sum(in_range, axis=(2, 3)).astype(features.dtype)
        pooled = jnp.sum(vals, axis=(2, 3)) / jnp.maximum(cnt, 1.0)[..., None]
        pooled = jnp.where(cnt[..., None] > 0, pooled, 0.0)
        # position-sensitive selection: [P, P, out_dim]
        pooled = pooled.reshape(p, p, out_dim, gs, gs)
        pooled = pooled[
            jnp.arange(p)[:, None], jnp.arange(p)[None, :], :,
            gh[:, None], gh[None, :],
        ]
        return pooled

    if offsets is None:
        return jax.vmap(
            lambda bi, a, b_, c_, d_, e_, f_: per_roi(
                bi, a, b_, c_, d_, e_, f_, None
            )
        )(batch_idx, x1, y1, bin_w, bin_h, roi_w, roi_h)
    return jax.vmap(per_roi)(
        batch_idx, x1, y1, bin_w, bin_h, roi_w, roi_h, offsets
    )
