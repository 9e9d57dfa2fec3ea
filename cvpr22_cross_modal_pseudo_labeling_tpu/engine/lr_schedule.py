"""WarmupMultiStepLR as an optax schedule.

Re-derivation of reference solver/lr_scheduler.py:10-52: linear (or
constant) warmup to BASE_LR over WARMUP_ITERS at WARMUP_FACTOR, then
GAMMA decay at each milestone in STEPS.
"""

from typing import Sequence

import jax.numpy as jnp


def warmup_multistep_schedule(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 3,
    warmup_iters: int = 500,
    warmup_method: str = "linear",
):
    milestones = jnp.asarray(sorted(steps), jnp.int32)

    def schedule(count):
        count = jnp.asarray(count)
        if warmup_method == "linear":
            alpha = jnp.minimum(count.astype(jnp.float32) / max(warmup_iters, 1), 1.0)
            wf = jnp.where(
                count < warmup_iters,
                warmup_factor * (1 - alpha) + alpha,
                1.0,
            )
        elif warmup_method == "constant":
            wf = jnp.where(count < warmup_iters, warmup_factor, 1.0)
        else:
            raise ValueError(warmup_method)
        decay = gamma ** jnp.sum(
            (count >= milestones).astype(jnp.float32)
        )
        return base_lr * wf * decay

    return schedule
