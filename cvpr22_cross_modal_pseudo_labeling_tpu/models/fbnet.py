"""FBNet mobile backbone (reference modeling/backbone/fbnet.py +
fbnet_builder.py + fbnet_modeldef.py, ~1.3k LoC of Caffe2-heritage
builder machinery distilled to the parts the detection registry uses).

Architecture definitions are MobileNet-style stage tables
``[expansion t, channels c, repeats n, stride s]`` with per-block op
types (only ``ir_k{3,5,7}`` inverted-residual ops appear in the five
shipped archs, fbnet_modeldef.py).  The trunk is the ``backbone``
subset of stages after the stem (fbnet.py:73-95 ``FBNetTrunk`` /
``_get_trunk_cfg``); the rpn/bbox/mask stage groups the reference
feeds to its FBNet-specific heads are dead in every shipped config and
are not rebuilt.  Channel scaling (``SCALE_FACTOR``) rounds to
``WIDTH_DIVISOR`` like fbnet_builder._get_divisible_by.

Norm layers follow this framework's detection convention (frozen
affine like the ResNet stack); train-mode BatchNorm statistics are a
training-recipe feature the reference never exercises in a shipped
config.
"""

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# [t, c, n, s] stage tables + per-stage op kernel sizes.  Re-typed from
# fbnet_modeldef.py MODEL_ARCH (data, not code); "backbone" lists the
# trunk stages (the rest feed the reference's FBNet heads).
MODEL_ARCH = {
    "default": {
        "first": (32, 2),
        "stages": [
            [(1, 16, 1, 1, 3)],
            [(6, 24, 2, 2, 3)],
            [(6, 32, 3, 2, 3)],
            [(6, 64, 4, 2, 3), (6, 96, 3, 1, 3)],
        ],
    },
    "xirb16d_dsmask": {
        "first": (16, 2),
        "stages": [
            [(1, 16, 1, 1, 3)],
            [(6, 32, 2, 2, 3)],
            [(6, 48, 3, 2, 3)],
            [(6, 96, 4, 2, 3), (6, 128, 3, 1, 3)],
        ],
    },
    "mobilenet_v2": {
        "first": (32, 2),
        "stages": [
            [(1, 16, 1, 1, 3)],
            [(6, 24, 2, 2, 3)],
            [(6, 32, 3, 2, 3)],
            [(6, 64, 4, 2, 3), (6, 96, 3, 1, 3)],
        ],
    },
    "cham_v1a": {
        "first": (32, 2),
        "stages": [
            [(1, 24, 1, 1, 3)],
            [(4, 48, 2, 2, 7)],
            [(7, 64, 5, 2, 3)],
            [(12, 56, 7, 2, 5), (8, 88, 5, 1, 3)],
        ],
    },
    "cham_v2": {
        "first": (32, 2),
        "stages": [
            [(1, 24, 1, 1, 3)],
            [(8, 32, 4, 2, 5)],
            [(5, 48, 4, 2, 5)],
            [(9, 56, 4, 2, 5), (6, 56, 3, 1, 3)],
        ],
    },
}


def _divisible(c: float, divisor: int) -> int:
    """fbnet_builder._get_divisible_by: round to the nearest multiple,
    never below the divisor."""
    if divisor <= 1:
        return int(round(c))
    return max(divisor, int(round(c / divisor)) * divisor)


class _FrozenAffine(nn.Module):
    """Per-channel affine (the frozen-BN stand-in used stack-wide)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "frozen_bn_weight", nn.initializers.ones, (self.features,)
        )
        bias = self.param(
            "frozen_bn_bias", nn.initializers.zeros, (self.features,)
        )
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class InvertedResidual(nn.Module):
    """ir_kN (fbnet_builder.IRFBlock): 1x1 expand -> kxk depthwise
    (stride s) -> 1x1 project, residual when shapes allow."""

    t: int
    c_out: int
    stride: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        mid = c_in * self.t
        y = x
        if self.t != 1:
            y = nn.Conv(
                mid, (1, 1), use_bias=False, dtype=self.dtype, name="pw"
            )(y)
            y = _FrozenAffine(mid, name="pw_bn")(y)
            y = nn.relu(y)
        y = nn.Conv(
            mid,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.kernel // 2,
            feature_group_count=mid,
            use_bias=False,
            dtype=self.dtype,
            name="dw",
        )(y)
        y = _FrozenAffine(mid, name="dw_bn")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.c_out, (1, 1), use_bias=False, dtype=self.dtype,
            name="pwl",
        )(y)
        y = _FrozenAffine(self.c_out, name="pwl_bn")(y)
        if self.stride == 1 and c_in == self.c_out:
            y = y + x
        return y


class FBNetTrunk(nn.Module):
    """Stem + backbone stages; returns a single stride-16 feature map
    (like the reference's single-element list, fbnet.py:90-95)."""

    arch: str = "default"
    scale_factor: float = 1.0
    width_divisor: int = 1
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        last = MODEL_ARCH[self.arch]["stages"][-1][-1][1]
        return _divisible(last * self.scale_factor, self.width_divisor)

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        spec = MODEL_ARCH[self.arch]
        c_first, s_first = spec["first"]
        c_first = _divisible(c_first * self.scale_factor, self.width_divisor)
        y = nn.Conv(
            c_first, (3, 3), strides=(s_first, s_first), padding=1,
            use_bias=False, dtype=self.dtype, name="first",
        )(x)
        y = _FrozenAffine(c_first, name="first_bn")(y)
        y = nn.relu(y)
        for si, stage in enumerate(spec["stages"]):
            for gi, (t, c, n, s, k) in enumerate(stage):
                c = _divisible(c * self.scale_factor, self.width_divisor)
                for bi in range(n):
                    y = InvertedResidual(
                        t=t,
                        c_out=c,
                        stride=s if bi == 0 else 1,
                        kernel=k,
                        dtype=self.dtype,
                        name=f"stage{si}_g{gi}_b{bi}",
                    )(y)
        return [y]
