"""Keypoint head (parity component; KEYPOINT_ON is off in every shipped
reference config).

Re-design of reference modeling/roi_heads/keypoint_head/*: feature
extractor = pooler + 8 3x3/512 convs (KeypointRCNNFeatureExtractor),
predictor = 4x4/2 transposed conv to K heatmaps + 2x bilinear upscale
(KeypointRCNNPredictor), loss = softmax CE over the flattened heatmap at
each visible keypoint's discretized location
(structures/keypoint.py:154 keypoints_to_heat_map + keypoint_head
loss), inference = per-heatmap argmax -> image coordinates.
"""

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class KeypointPredictor(nn.Module):
    num_keypoints: int = 17
    conv_layers: Tuple[int, ...] = (512,) * 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        x = pooled
        for i, ch in enumerate(self.conv_layers):
            x = nn.Conv(
                ch, (3, 3), padding=1,
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_out", "truncated_normal"
                ),
                dtype=self.dtype, name=f"conv_fcn{i + 1}",
            )(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2), padding="SAME",
            dtype=self.dtype, name="kps_score_lowres",
        )(x)
        # 2x bilinear upscale (interpolate in the reference predictor)
        n, h, w, k = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, k), "bilinear")
        return x  # [N, H', W', K] logits


def keypoints_to_heatmap_targets(
    keypoints: jnp.ndarray,
    rois: jnp.ndarray,
    heatmap_size: int,
):
    """keypoints [S, K, 3] (x, y, vis); rois [S, 4].  Returns (targets
    [S, K] int flattened heatmap index, valid [S, K]) — the
    keypoints_to_heat_map discretization (keypoint.py:154)."""
    offset_x = rois[:, 0][:, None]
    offset_y = rois[:, 1][:, None]
    scale_x = heatmap_size / jnp.maximum(rois[:, 2] - rois[:, 0], 1e-6)
    scale_y = heatmap_size / jnp.maximum(rois[:, 3] - rois[:, 1], 1e-6)
    # boundary snap applies when the ORIGINAL coordinate equals the box
    # edge (keypoint.py:170-179), not when the discretized bin happens
    # to land on the boundary — a point just outside the box must stay
    # invalid even if its floor() bin is exactly heatmap_size
    x_edge = keypoints[..., 0] == rois[:, 2][:, None]
    y_edge = keypoints[..., 1] == rois[:, 3][:, None]
    x = (keypoints[..., 0] - offset_x) * scale_x[:, None]
    y = (keypoints[..., 1] - offset_y) * scale_y[:, None]
    x = jnp.floor(x).astype(jnp.int32)
    y = jnp.floor(y).astype(jnp.int32)
    x = jnp.where(x_edge, heatmap_size - 1, x)
    y = jnp.where(y_edge, heatmap_size - 1, y)
    in_range = (
        (x >= 0) & (x < heatmap_size) & (y >= 0) & (y < heatmap_size)
    )
    valid = in_range & (keypoints[..., 2] > 0)
    targets = y * heatmap_size + x
    return jnp.clip(targets, 0, heatmap_size * heatmap_size - 1), valid


def keypoint_loss(
    kp_logits: jnp.ndarray,
    keypoints: jnp.ndarray,
    rois: jnp.ndarray,
    roi_valid: jnp.ndarray,
) -> jnp.ndarray:
    """kp_logits [S, H, W, K]; CE over spatial positions of visible
    keypoints, mean over visible keypoints."""
    s, h, w, k = kp_logits.shape
    flat = kp_logits.transpose(0, 3, 1, 2).reshape(s, k, h * w)
    targets, valid = keypoints_to_heatmap_targets(keypoints, rois, h)
    valid = valid & roi_valid[:, None]
    logp = jax.nn.log_softmax(flat, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll * valid) / denom


def keypoint_inference(kp_logits: jnp.ndarray, rois: jnp.ndarray):
    """Heatmap argmax -> image coordinates + scores.
    Returns (xy [S, K, 2], scores [S, K])."""
    s, h, w, k = kp_logits.shape
    flat = kp_logits.transpose(0, 3, 1, 2).reshape(s, k, h * w)
    probs = jax.nn.softmax(flat, axis=-1)
    idx = jnp.argmax(flat, axis=-1)
    scores = jnp.take_along_axis(probs, idx[..., None], axis=-1)[..., 0]
    yy = (idx // w).astype(jnp.float32) + 0.5
    xx = (idx % w).astype(jnp.float32) + 0.5
    roi_w = jnp.maximum(rois[:, 2] - rois[:, 0], 1e-6)[:, None]
    roi_h = jnp.maximum(rois[:, 3] - rois[:, 1], 1e-6)[:, None]
    x = rois[:, 0][:, None] + xx / w * roi_w
    y = rois[:, 1][:, None] + yy / h * roi_h
    return jnp.stack([x, y], axis=-1), scores
