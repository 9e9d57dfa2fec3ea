"""Shared loss primitives (pure jnp).

smooth_l1_loss mirrors reference layers/smooth_l1_loss.py:7-16
(beta-scaled Huber, elementwise); weighted cross-entropy variants
support the reference's background-weighted classification
(roi_heads/box_head/loss.py:172-181).
"""

import jax
import jax.numpy as jnp


def smooth_l1_loss(
    pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0 / 9
) -> jnp.ndarray:
    n = jnp.abs(pred - target)
    return jnp.where(n < beta, 0.5 * n**2 / beta, n - 0.5 * beta)


def softmax_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray
) -> jnp.ndarray:
    """Per-example CE for int labels; labels clipped into range (callers
    mask invalid rows)."""
    labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def binary_cross_entropy_with_logits(
    logits: jnp.ndarray, targets: jnp.ndarray
) -> jnp.ndarray:
    # -[t log sigma(x) + (1-t) log sigma(-x)], numerically stable
    return -(
        targets * jax.nn.log_sigmoid(logits)
        + (1.0 - targets) * jax.nn.log_sigmoid(-logits)
    )
