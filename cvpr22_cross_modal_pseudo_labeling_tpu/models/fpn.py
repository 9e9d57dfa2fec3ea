"""Feature Pyramid Network neck.

Re-design of reference modeling/backbone/fpn.py:7-99: lateral 1x1 convs,
nearest-2x top-down merge, 3x3 output convs; LastLevelMaxPool adds P6
via a stride-2 1x1 maxpool, LastLevelP6P7 the RetinaNet variant.
NHWC / linen; group-norm option mirrors make_layers.conv_with_kaiming_uniform.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


def _upsample_nearest_2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    in_channels_list: Sequence[int]
    out_channels: int = 256
    use_gn: bool = False
    use_relu: bool = False
    top_block: str = "maxpool"  # "maxpool" | "p6p7" | "none"
    # RetinaNet P6 input: C5 (reference MODEL.RETINANET.USE_C5=True,
    # backbone.py:54 -> LastLevelP6P7 with in_channels 2048) or P5
    p6p7_on_c5: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        """features: [C2, C3, C4, C5] (coarsest last). Returns [P2..P5(+P6/P7)]."""

        def block(x, feats, kernel, name):
            pad = (kernel - 1) // 2
            x = nn.Conv(
                feats, (kernel, kernel), padding=((pad, pad), (pad, pad)),
                use_bias=not self.use_gn, dtype=self.dtype, name=name,
            )(x)
            if self.use_gn:
                x = nn.GroupNorm(num_groups=32, name=name + "_gn")(x)
            if self.use_relu:
                x = nn.relu(x)
            return x

        n = len(features)
        last_inner = block(
            features[-1], self.out_channels, 1, f"fpn_inner{n}"
        )
        results = [block(last_inner, self.out_channels, 3, f"fpn_layer{n}")]
        for idx in range(n - 2, -1, -1):
            if self.in_channels_list[idx] == 0:
                continue
            inner_lateral = block(
                features[idx], self.out_channels, 1, f"fpn_inner{idx + 1}"
            )
            top_down = _upsample_nearest_2x(last_inner)
            # crop in case of odd input sizes
            th, tw = inner_lateral.shape[1:3]
            top_down = top_down[:, :th, :tw]
            last_inner = inner_lateral + top_down
            results.insert(
                0, block(last_inner, self.out_channels, 3, f"fpn_layer{idx + 1}")
            )

        if self.top_block == "maxpool":
            # LastLevelMaxPool (fpn.py:85-88): kernel 1, stride 2
            p6 = nn.max_pool(results[-1], (1, 1), strides=(2, 2))
            results.append(p6)
        elif self.top_block == "p6p7":
            # LastLevelP6P7 (fpn.py:82-97): use_P5 = in==out channels;
            # with USE_C5 the 2048-ch C5 feeds P6, not the 256-ch P5
            p6_in = features[-1] if self.p6p7_on_c5 else results[-1]
            p6 = nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), dtype=self.dtype, name="fpn_p6",
            )(p6_in)
            p7 = nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), dtype=self.dtype, name="fpn_p7",
            )(nn.relu(p6))
            results.extend([p6, p7])
        return results
