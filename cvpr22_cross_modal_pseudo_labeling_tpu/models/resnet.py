"""ResNet backbone with frozen BatchNorm, NHWC, Flax linen.

Re-design of the reference's cfg-driven ResNet
(reference: maskrcnn_benchmark/modeling/backbone/resnet.py:81-451) for
TPU: channels-last layout, bfloat16-friendly compute dtype, functional
freezing (the optimizer masks frozen stages; see engine/optimizer.py)
instead of ``requires_grad`` mutation (resnet.py:134-143).

FrozenBatchNorm matches layers/batch_norm.py:6-25 exactly:
``scale = weight / sqrt(running_var)`` with **no epsilon** (Caffe2
imports fold it in), ``bias = bias - running_mean * scale``.  Its
tensors live in the ``params`` collection (so checkpoint import is one
tree) but are excluded from optimization by path ("frozen_bn").
"""

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# (stage block counts, include_stage5) per CONV_BODY
# (reference resnet.py:46-79 _STAGE_SPECS)
RESNET_STAGES = {
    "R-50": (3, 4, 6, 3),
    "R-101": (3, 4, 23, 3),
    "R-152": (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """Affine transform with frozen statistics (layers/batch_norm.py)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.ones
        zinit = nn.initializers.zeros
        weight = self.param("frozen_bn_weight", init, (self.features,))
        bias = self.param("frozen_bn_bias", zinit, (self.features,))
        mean = self.param("frozen_bn_mean", zinit, (self.features,))
        var = self.param("frozen_bn_var", init, (self.features,))
        scale = weight / jnp.sqrt(var)
        shift = bias - mean * scale
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


def _conv(features, kernel, stride=1, dilation=1, name=None, use_bias=False,
          dtype=jnp.float32):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )


class Bottleneck(nn.Module):
    """BottleneckWithFixedBatchNorm / BottleneckWithDCN
    (resnet.py:240-300; DCN variant per STAGE_WITH_DCN,
    defaults.py:384)."""

    in_channels: int
    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    dilation: int = 1
    stride_in_1x1: bool = True
    num_groups: int = 1
    with_dcn: bool = False
    with_modulated_dcn: bool = False
    norm: str = "frozen_bn"  # "frozen_bn" | "gn" (TRANS_FUNC BottleneckWithGN)
    dtype: Any = jnp.float32

    def _norm(self, features, name):
        if self.norm == "gn":
            return nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)
        return FrozenBatchNorm(features, self.dtype, name=name)

    @nn.compact
    def __call__(self, x):
        s1, s3 = (
            (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        )
        identity = x
        if self.in_channels != self.out_channels or self.stride != 1:
            down_stride = self.stride if self.dilation == 1 else 1
            identity = _conv(
                self.out_channels, 1, down_stride, name="downsample_conv",
                dtype=self.dtype,
            )(x)
            identity = self._norm(
                self.out_channels, "downsample_bn"
            )(identity)

        out = _conv(self.bottleneck_channels, 1, s1, name="conv1",
                    dtype=self.dtype)(x)
        out = self._norm(self.bottleneck_channels, "bn1")(out)
        out = nn.relu(out)
        if self.with_dcn:
            # offsets (+ modulation masks) from a zero-init regular conv
            # (dcn/deform_conv_module.py), then deformable sampling
            from ..ops.deform_conv import deform_conv2d

            n_off = 27 if self.with_modulated_dcn else 18
            # reference conv2_offset is dilated like the main conv
            # (layers/misc.py:158) — without kernel_dilation the offset
            # map's spatial shape disagrees with the deformable grid
            off = nn.Conv(
                n_off, (3, 3), strides=(s3, s3),
                padding=((self.dilation,) * 2,) * 2,
                kernel_dilation=(self.dilation, self.dilation),
                kernel_init=nn.initializers.zeros,
                dtype=self.dtype, name="conv2_offset",
            )(out)
            kernel = self.param(
                "conv2_kernel",
                nn.initializers.variance_scaling(
                    2.0, "fan_out", "truncated_normal"
                ),
                (3, 3, out.shape[-1] // self.num_groups,
                 self.bottleneck_channels),
            )
            if self.with_modulated_dcn:
                offsets, mask = off[..., :18], nn.sigmoid(off[..., 18:])
            else:
                offsets, mask = off, None
            out = deform_conv2d(
                out.astype(jnp.float32),
                offsets.astype(jnp.float32),
                kernel.astype(jnp.float32),
                mask=None if mask is None else mask.astype(jnp.float32),
                stride=s3,
                padding=self.dilation,
                dilation=self.dilation,
                groups=self.num_groups,
            ).astype(self.dtype)
        else:
            out = nn.Conv(
                self.bottleneck_channels,
                (3, 3),
                strides=(s3, s3),
                padding=((self.dilation, self.dilation),) * 2,
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.num_groups,
                use_bias=False,
                dtype=self.dtype,
                name="conv2",
            )(out)
        out = self._norm(self.bottleneck_channels, "bn2")(out)
        out = nn.relu(out)
        out = _conv(self.out_channels, 1, 1, name="conv3", dtype=self.dtype)(out)
        out = self._norm(self.out_channels, "bn3")(out)
        return nn.relu(out + identity)


def s2d_stem_kernel(w7: jnp.ndarray) -> jnp.ndarray:
    """Remaps the 7x7/stride-2 stem kernel [7, 7, C, O] to the
    equivalent 4x4/stride-1 kernel [4, 4, 4C, O] over a 2x2
    space-to-depth input.

    Math: out[h', w'] = sum_{i,j} W7[i,j] * x[2h'+i-3, 2w'+j-3].  With
    y[u, v, (du, dv, c)] = x[2u+du, 2v+dv, c], each tap (i, j) lands at
    exactly one (a, b, du, dv): rows with i odd come from du=0 at
    a=(i+1)/2, i even from du=1 at a=i/2 (same for j/b/dv), giving a
    4x4 window with padding (2, 1).  Exact — same taps, same weights
    (the classic MLPerf-ResNet TPU stem rewrite): the 3-channel conv
    that filled 3/128 of the MXU's reduction lanes becomes a 12-channel
    one at 1/4 the spatial size, which matters when FREEZE_AT=0 puts
    the stem's backward on the clock (MMSS)."""
    k1, k2, cin, cout = w7.shape
    assert (k1, k2) == (7, 7), w7.shape
    w4 = jnp.zeros((4, 4, 4 * cin, cout), w7.dtype)
    for i in range(7):
        du, a = (0, (i + 1) // 2) if i % 2 == 1 else (1, i // 2)
        for j in range(7):
            dv, b = (0, (j + 1) // 2) if j % 2 == 1 else (1, j // 2)
            ch0 = (du * 2 + dv) * cin
            w4 = w4.at[a, b, ch0 : ch0 + cin, :].set(w7[i, j])
    return w4


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], channel index (du, dv, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


class _StemKernel(nn.Module):
    """Bare kernel holder so the s2d path creates the SAME param
    (stem/conv1/kernel, lecun_normal — nn.Conv's default) as the
    canonical 7x7 conv branch."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape,
            jnp.float32,
        )


class Stem(nn.Module):
    """StemWithFixedBatchNorm / StemWithGN (resnet.py:383-404): 7x7/2
    conv + norm + relu + 3x3/2 maxpool.

    ``s2d``: compute the identical function as a 4x4/stride-1 conv on a
    2x2 space-to-depth input (TPU.S2D_STEM).  The parameter tree is
    unchanged — the 7x7 kernel is remapped in-graph by
    :func:`s2d_stem_kernel`, so checkpoints/imports are oblivious and
    gradients flow back to the canonical layout."""

    out_channels: int = 64
    norm: str = "frozen_bn"
    dtype: Any = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        use_s2d = (
            self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        )
        if use_s2d:
            w7 = _StemKernel(
                (7, 7, x.shape[-1], self.out_channels), name="conv1"
            )()
            w4 = s2d_stem_kernel(w7.astype(self.dtype))
            y = space_to_depth(x).astype(self.dtype)
            x = jax.lax.conv_general_dilated(
                y, w4,
                window_strides=(1, 1),
                padding=((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            x = nn.Conv(
                self.out_channels,
                (7, 7),
                strides=(2, 2),
                padding=((3, 3), (3, 3)),
                use_bias=False,
                dtype=self.dtype,
                name="conv1",
            )(x)
        if self.norm == "gn":
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="bn1")(x)
        else:
            x = FrozenBatchNorm(self.out_channels, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        return x


class ResNetStage(nn.Module):
    """_make_stage (resnet.py:202-237): block_count bottlenecks, stride on
    the first."""

    block_count: int
    in_channels: int
    bottleneck_channels: int
    out_channels: int
    first_stride: int
    dilation: int = 1
    stride_in_1x1: bool = True
    num_groups: int = 1
    with_dcn: bool = False
    with_modulated_dcn: bool = False
    norm: str = "frozen_bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = self.in_channels
        stride = self.first_stride
        for i in range(self.block_count):
            x = Bottleneck(
                in_channels=in_ch,
                bottleneck_channels=self.bottleneck_channels,
                out_channels=self.out_channels,
                stride=stride,
                dilation=self.dilation,
                stride_in_1x1=self.stride_in_1x1,
                num_groups=self.num_groups,
                with_dcn=self.with_dcn,
                with_modulated_dcn=self.with_modulated_dcn,
                norm=self.norm,
                dtype=self.dtype,
                name=f"block{i}",
            )(x)
            in_ch = self.out_channels
            stride = 1
        return x


class ResNet(nn.Module):
    """Backbone body.  ``stages`` counts blocks for stages 2..N; returns
    the feature maps named in ``return_stages`` (e.g. ("C4",) for the
    detection configs, ("C2","C3","C4","C5") for FPN).

    reference: resnet.py:81-152 (cfg plumbing), stage math identical.
    """

    stages: Sequence[int]
    return_stages: Sequence[str]
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    with_modulated_dcn: bool = False
    norm: str = "frozen_bn"
    # FREEZE_CONV_BODY_AT semantics (reference resnet.py:134-143): k
    # freezes stem + layers 1..k-1.  Applied as stop_gradient at the
    # freeze boundary so XLA deletes the frozen prefix's backward
    # entirely (the optimizer mask alone still paid for computing those
    # gradients at the largest spatial resolutions).
    freeze_at: int = 0
    dtype: Any = jnp.float32
    # TPU.S2D_STEM: space-to-depth stem rewrite (exact; s2d_stem_kernel)
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        x = Stem(
            self.stem_out_channels, self.norm, self.dtype,
            s2d=self.s2d_stem, name="stem"
        )(x)
        if self.freeze_at > 0:
            x = jax.lax.stop_gradient(x)
        out = {}
        in_ch = self.stem_out_channels
        stage2_bottleneck = self.num_groups * self.width_per_group
        for idx, block_count in enumerate(self.stages):
            stage_num = idx + 2  # C2..C5
            factor = 2**idx
            out_ch = self.res2_out_channels * factor
            bottleneck = stage2_bottleneck * factor
            dilation = (
                self.res5_dilation if stage_num == 5 else 1
            )
            first_stride = 1 if stage_num == 2 or dilation > 1 else 2
            x = ResNetStage(
                block_count=block_count,
                in_channels=in_ch,
                bottleneck_channels=bottleneck,
                out_channels=out_ch,
                first_stride=first_stride,
                dilation=dilation,
                stride_in_1x1=self.stride_in_1x1,
                num_groups=self.num_groups,
                with_dcn=bool(self.stage_with_dcn[idx])
                if idx < len(self.stage_with_dcn) else False,
                with_modulated_dcn=self.with_modulated_dcn,
                norm=self.norm,
                dtype=self.dtype,
                name=f"layer{stage_num - 1}",
            )(x)
            if stage_num - 1 < self.freeze_at:
                x = jax.lax.stop_gradient(x)
            in_ch = out_ch
            out[f"C{stage_num}"] = x
        return {k: out[k] for k in self.return_stages}


class ResNetRoIHead(nn.Module):
    """ResNetHead (resnet.py:155-199): the C5 stage applied to pooled
    RoI features (ResNet50Conv5ROIFeatureExtractor,
    roi_box_feature_extractors.py:13-46).  stride_init=None -> first
    stride 2 (stage index 4 > 1)."""

    block_count: int = 3
    in_channels: int = 1024
    out_channels: int = 2048
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    dilation: int = 1
    # prestrided: the pooler already emitted only the even bins
    # (pool_rois bin_stride=2), so the stride-2 that the first 1x1
    # convs would apply is a no-op — run them stride 1.  Bit-identical
    # when stride_in_1x1 and dilation == 1; 4x less pooling work.
    prestrided: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bottleneck = self.num_groups * self.width_per_group * 8
        first_stride = 2 if self.dilation == 1 else 1
        if self.prestrided:
            first_stride = 1
        return ResNetStage(
            block_count=self.block_count,
            in_channels=self.in_channels,
            bottleneck_channels=bottleneck,
            out_channels=self.out_channels,
            first_stride=first_stride,
            dilation=self.dilation,
            stride_in_1x1=self.stride_in_1x1,
            dtype=self.dtype,
            name="layer4",
        )(x)
