"""Backbone builders: CONV_BODY string -> module + metadata.

Mirrors the registry dispatch of reference
modeling/backbone/backbone.py:12-79 for the bodies the shipped configs
use (R-50/101/152 C4/C5/FPN).  FBNet (reference fbnet.py) is
intentionally not rebuilt — dead code for all shipped configs
(SURVEY.md "Won't build").
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .fpn import FPN
from .resnet import RESNET_STAGES, ResNet


def device_normalize(
    images: jnp.ndarray,
    image_sizes: jnp.ndarray,
    pixel_mean: Tuple[float, ...] = (102.9801, 115.9465, 122.7717),
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0),
    to_bgr255: bool = True,
) -> jnp.ndarray:
    """Device-side image normalization for uint8 batches.

    The reference normalizes on the host (transforms.py:110-120 with
    INPUT.PIXEL_MEAN, defaults.py:62) before DataLoader collation.  On
    TPU that costs two host-side full-image float passes per sample and
    a float32 host->HBM transfer; shipping the padded batch as uint8
    instead cuts the transfer 4x and the flip/subtract/divide fuse into
    the stem conv's input.  Numerics match the host path bit-for-bit:
    the same float32 ops in the same order, and the padded region is
    re-zeroed (the host path pads AFTER normalize with zeros,
    reference structures/image_list.py:54-66).

    Float inputs are returned unchanged (already host-normalized — the
    test suite and the TTA path feed those).
    """
    if jnp.issubdtype(images.dtype, jnp.floating):
        return images
    x = images.astype(jnp.float32)
    if to_bgr255:
        x = x[..., ::-1]
    else:
        x = x / 255.0
    mean = jnp.asarray(pixel_mean, jnp.float32)
    std = jnp.asarray(pixel_std, jnp.float32)
    x = (x - mean) / std
    h = jnp.arange(images.shape[1])[None, :, None, None]
    w = jnp.arange(images.shape[2])[None, None, :, None]
    valid = (h < image_sizes[:, 0, None, None, None]) & (
        w < image_sizes[:, 1, None, None, None]
    )
    return jnp.where(valid, x, 0.0)


class ResNetBackbone(nn.Module):
    """C4/C5 single-feature backbone."""

    depth: str = "R-50"
    num_stages: int = 3  # 3 -> C4, 4 -> C5
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    stage_with_dcn: tuple = (False, False, False, False)
    with_modulated_dcn: bool = False
    norm: str = "frozen_bn"
    freeze_at: int = 0
    dtype: Any = jnp.float32
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x):
        stages = RESNET_STAGES[self.depth][: self.num_stages]
        ret = f"C{self.num_stages + 1}"
        feats = ResNet(
            stages=stages,
            return_stages=(ret,),
            freeze_at=self.freeze_at,
            stem_out_channels=self.stem_out_channels,
            res2_out_channels=self.res2_out_channels,
            num_groups=self.num_groups,
            width_per_group=self.width_per_group,
            stride_in_1x1=self.stride_in_1x1,
            res5_dilation=self.res5_dilation,
            stage_with_dcn=self.stage_with_dcn,
            with_modulated_dcn=self.with_modulated_dcn,
            norm=self.norm,
            dtype=self.dtype,
            s2d_stem=self.s2d_stem,
            name="body",
        )(x)
        return [feats[ret]]


class ResNetFPNBackbone(nn.Module):
    depth: str = "R-50"
    out_channels: int = 256
    use_gn: bool = False
    use_relu: bool = False
    retinanet: bool = False
    retinanet_use_c5: bool = True  # MODEL.RETINANET.USE_C5
    stage_with_dcn: tuple = (False, False, False, False)
    with_modulated_dcn: bool = False
    norm: str = "frozen_bn"
    freeze_at: int = 0
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    dtype: Any = jnp.float32
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x):
        feats = ResNet(
            stages=RESNET_STAGES[self.depth],
            return_stages=("C2", "C3", "C4", "C5"),
            freeze_at=self.freeze_at,
            stem_out_channels=self.stem_out_channels,
            res2_out_channels=self.res2_out_channels,
            num_groups=self.num_groups,
            width_per_group=self.width_per_group,
            stride_in_1x1=self.stride_in_1x1,
            stage_with_dcn=self.stage_with_dcn,
            with_modulated_dcn=self.with_modulated_dcn,
            norm=self.norm,
            dtype=self.dtype,
            s2d_stem=self.s2d_stem,
            name="body",
        )(x)
        feats = [feats[k] for k in ("C2", "C3", "C4", "C5")]
        c = self.res2_out_channels
        if self.retinanet:
            # RetinaNet pyramids start at P3 (C2 skipped, reference
            # backbone.py:48-71 passes in_channels 0 for C2)
            feats = feats[1:]
            in_list = [c * 2, c * 4, c * 8]
        else:
            in_list = [c, c * 2, c * 4, c * 8]
        return FPN(
            in_channels_list=in_list,
            out_channels=self.out_channels,
            use_gn=self.use_gn,
            use_relu=self.use_relu,
            top_block="p6p7" if self.retinanet else "maxpool",
            p6p7_on_c5=self.retinanet_use_c5,
            dtype=self.dtype,
            name="fpn",
        )(feats)


def build_backbone(cfg, dtype=jnp.float32) -> Tuple[nn.Module, dict]:
    """Returns (module, meta) where meta has out_channels, strides and
    the freeze prefix list for the optimizer mask."""
    body = cfg.MODEL.BACKBONE.CONV_BODY
    r = cfg.MODEL.RESNETS
    common = dict(
        stem_out_channels=r.STEM_OUT_CHANNELS,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        num_groups=r.NUM_GROUPS,
        width_per_group=r.WIDTH_PER_GROUP,
        stride_in_1x1=r.STRIDE_IN_1X1,
        stage_with_dcn=tuple(r.STAGE_WITH_DCN),
        with_modulated_dcn=r.WITH_MODULATED_DCN,
        norm="gn" if "GN" in r.TRANS_FUNC else "frozen_bn",
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT,
        dtype=dtype,
        s2d_stem=cfg.TPU.S2D_STEM,
    )
    if body.endswith("-C4"):
        depth = body[: -len("-C4")]
        mod = ResNetBackbone(depth=depth, num_stages=3, **common)
        meta = dict(out_channels=r.RES2_OUT_CHANNELS * 4, strides=(16,))
    elif body.endswith("-C5"):
        depth = body[: -len("-C5")]
        mod = ResNetBackbone(
            depth=depth, num_stages=4, res5_dilation=r.RES5_DILATION, **common
        )
        meta = dict(out_channels=r.RES2_OUT_CHANNELS * 8, strides=(32,))
    elif body.endswith("-FPN-RETINANET"):
        depth = body[: -len("-FPN-RETINANET")]
        mod = ResNetFPNBackbone(
            depth=depth,
            out_channels=r.BACKBONE_OUT_CHANNELS,
            use_gn=cfg.MODEL.FPN.USE_GN,
            use_relu=cfg.MODEL.FPN.USE_RELU,
            retinanet=True,
            retinanet_use_c5=cfg.MODEL.RETINANET.USE_C5,
            **common,
        )
        meta = dict(
            out_channels=r.BACKBONE_OUT_CHANNELS,
            strides=(8, 16, 32, 64, 128),
        )
    elif body.endswith("-FPN"):
        depth = body[: -len("-FPN")]
        mod = ResNetFPNBackbone(
            depth=depth,
            out_channels=r.BACKBONE_OUT_CHANNELS,
            use_gn=cfg.MODEL.FPN.USE_GN,
            use_relu=cfg.MODEL.FPN.USE_RELU,
            **common,
        )
        meta = dict(
            out_channels=r.BACKBONE_OUT_CHANNELS, strides=(4, 8, 16, 32, 64)
        )
    elif body == "FBNet":
        from .fbnet import FBNetTrunk

        f = cfg.MODEL.FBNET
        mod = FBNetTrunk(
            arch=f.ARCH,
            scale_factor=f.SCALE_FACTOR,
            width_divisor=f.WIDTH_DIVISOR,
            dtype=dtype,
        )
        meta = dict(out_channels=mod.out_channels, strides=(16,))
    else:
        raise ValueError(f"Unknown CONV_BODY {body}")

    # Freezing: FREEZE_CONV_BODY_AT=k freezes the stem and layers 1..k-1
    # (reference resnet.py:134-143 _freeze_backbone).
    freeze_at = cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT
    frozen_prefixes = []
    if freeze_at > 0:
        frozen_prefixes.append("body/stem")
        for i in range(1, freeze_at):
            frozen_prefixes.append(f"body/layer{i}")
    meta["frozen_prefixes"] = tuple(frozen_prefixes)
    return mod, meta
