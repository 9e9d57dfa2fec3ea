"""FREEZE_CONV_BODY_AT applies stop_gradient at the freeze boundary:
frozen-prefix gradients are exactly zero (so XLA can delete that
backward), unfrozen stages still train."""

import jax
import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.models.backbone import (
    ResNetBackbone,
)


def test_freeze_at_zeroes_prefix_gradients():
    mod = ResNetBackbone(depth="R-50", num_stages=3, freeze_at=2)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(mod.apply(p, x)[0] ** 2)

    g = jax.grad(loss)(params)["params"]["body"]

    def total(tree):
        return sum(
            float(jnp.sum(jnp.abs(v)))
            for v in jax.tree_util.tree_leaves(tree)
        )

    assert total(g["stem"]) == 0.0
    assert total(g["layer1"]) == 0.0
    assert total(g["layer2"]) > 0.0
    assert total(g["layer3"]) > 0.0


def test_freeze_at_zero_trains_everything():
    mod = ResNetBackbone(depth="R-50", num_stages=3, freeze_at=0)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(mod.apply(p, x)[0] ** 2)

    g = jax.grad(loss)(params)["params"]["body"]
    stem_total = sum(
        float(jnp.sum(jnp.abs(v)))
        for v in jax.tree_util.tree_leaves(g["stem"])
    )
    assert stem_total > 0.0
