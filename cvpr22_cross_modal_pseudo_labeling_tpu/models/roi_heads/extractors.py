"""Alternative RoI feature extractors and predictors (FPN family).

Re-designs of the remaining registry entries in reference
modeling/roi_heads/box_head/roi_box_feature_extractors.py:49-144
(FPN2MLPFeatureExtractor, FPNXconv1fcFeatureExtractor),
roi_box_predictors.py FPNPredictor, and the unused-but-registered mask
predictor variants (roi_mask_predictors.py: MaskRCNNConv1x1Predictor,
DropOut_MaskRCNNC4Predictor MC-dropout entropy, PixelScore variant).
The C4 path (ResNet50Conv5) lives in box_head.py/bundle.py.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN2MLPFeatureExtractor(nn.Module):
    """Pooled features -> flatten -> 2 FC (roi_box_feature_extractors.py:49-81)."""

    mlp_head_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):  # [N, P, P, C]
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(self.mlp_head_dim, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(self.mlp_head_dim, dtype=self.dtype, name="fc7")(x))
        return x  # [N, D]


class FPNXconv1fcFeatureExtractor(nn.Module):
    """4x conv3x3 + 1 FC (roi_box_feature_extractors.py:84-144)."""

    conv_head_dim: int = 256
    num_stacked_convs: int = 4
    mlp_head_dim: int = 1024
    dilation: int = 1
    use_gn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        x = pooled
        for i in range(self.num_stacked_convs):
            x = nn.Conv(
                self.conv_head_dim, (3, 3),
                padding=self.dilation,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=not self.use_gn,
                dtype=self.dtype,
                name=f"xconvs{i}",
            )(x)
            if self.use_gn:
                x = nn.GroupNorm(num_groups=32, name=f"xconvs{i}_gn")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.relu(
            nn.Dense(self.mlp_head_dim, dtype=self.dtype, name="fc6")(x)
        )


class FPNPredictor(nn.Module):
    """Plain linear cls/reg heads over MLP features
    (roi_box_predictors.py FPNPredictor)."""

    num_classes: int
    cls_agnostic_bbox_reg: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        logits = nn.Dense(
            self.num_classes, kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, name="cls_score",
        )(x)
        num_reg = 2 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(
            num_reg * 4, kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name="bbox_pred",
        )(x)
        return logits, deltas


class MaskRCNNConv1x1Predictor(nn.Module):
    """1x1 conv mask logits without upsampling
    (roi_mask_predictors.py MaskRCNNConv1x1Predictor)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype,
            name="mask_fcn_logits",
        )(x)


class DropoutMaskPredictor(nn.Module):
    """MC-dropout uncertainty variant (roi_mask_predictors.py
    DropOut_MaskRCNNC4Predictor:100-139): dropout stays active at
    inference; predictive entropy over n_samples passes is the
    uncertainty map."""

    num_classes: int
    dim_reduced: int = 256
    drop_rate: float = 0.5
    num_samples: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rng: jax.Array):
        up = nn.relu(
            nn.ConvTranspose(
                self.dim_reduced, (2, 2), strides=(2, 2),
                dtype=self.dtype, name="conv5_mask",
            )(x)
        )
        logits_head = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype,
            name="mask_fcn_logits",
        )

        def one_sample(key):
            keep = jax.random.bernoulli(
                key, 1.0 - self.drop_rate, up.shape
            )
            return logits_head(up * keep / (1.0 - self.drop_rate))

        keys = jax.random.split(rng, self.num_samples)
        samples = jnp.stack([one_sample(k) for k in keys])
        probs = jax.nn.sigmoid(samples)
        mean = jnp.mean(probs, axis=0)
        eps = 1e-6
        entropy = -(
            mean * jnp.log(mean + eps)
            + (1 - mean) * jnp.log(1 - mean + eps)
        )
        mean_logits = jnp.mean(samples, axis=0)
        return mean_logits, entropy


def pixel_score_uncertainty(mask_logits: jnp.ndarray) -> jnp.ndarray:
    """PixelScore variant (roi_mask_predictors.py:141-175): uncertainty
    = closeness of sigmoid probability to 0.5."""
    p = jax.nn.sigmoid(mask_logits)
    return 1.0 - 2.0 * jnp.abs(p - 0.5)
