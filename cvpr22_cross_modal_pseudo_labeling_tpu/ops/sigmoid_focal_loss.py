"""Sigmoid focal loss, pure jnp.

The reference's CUDA kernel
(reference: maskrcnn_benchmark/csrc/cuda/SigmoidFocalLoss_cuda.cu) and
its CPU fallback (layers/sigmoid_focal_loss.py:40-50) compute, per
anchor n and per class c in 1..C (0 is background):

  loss[n, c] = -alpha       * 1[t_n == c]            * (1-p)^g log(p)
               -(1 - alpha) * 1[t_n != c and t_n>=0] * p^g     log(1-p)

On TPU this is a fused VPU elementwise op; XLA autodiff replaces the
backward kernel.
"""

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float,
    alpha: float,
) -> jnp.ndarray:
    """Args: logits [N, C]; targets [N] int, class ids in 1..C, 0 = bg,
    negative = ignore.  Returns [N, C] per-element losses."""
    num_classes = logits.shape[1]
    class_range = jnp.arange(1, num_classes + 1)[None, :]
    t = targets[:, None]
    p = jax.nn.sigmoid(logits)
    # log-sigmoid forms for numerical stability (equivalent to
    # log(p) / log(1-p) in the reference formula).
    log_p = jax.nn.log_sigmoid(logits)
    log_1mp = jax.nn.log_sigmoid(-logits)
    term1 = (1.0 - p) ** gamma * log_p
    term2 = p**gamma * log_1mp
    pos = (t == class_range).astype(logits.dtype)
    neg = ((t != class_range) & (t >= 0)).astype(logits.dtype)
    return -pos * term1 * alpha - neg * term2 * (1.0 - alpha)
