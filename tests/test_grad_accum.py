import jax
import jax.numpy as jnp
import numpy as np
import optax

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.optimizer import (
    make_optimizer,
)


def test_multisteps_accumulation():
    cfg = get_default_cfg()
    cfg.SOLVER.GRADIENT_ACCUMULATION_STEPS = 2
    cfg.SOLVER.BASE_LR = 1.0
    cfg.SOLVER.MOMENTUM = 0.0
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.STEPS = (10**9,)
    params = {"w": jnp.zeros((2,))}
    tx, _ = make_optimizer(cfg, params)
    state = tx.init(params)

    g1 = {"w": jnp.array([1.0, 0.0])}
    g2 = {"w": jnp.array([0.0, 1.0])}
    # micro-step 1: no update applied yet
    up1, state = tx.update(g1, state, params)
    np.testing.assert_allclose(np.asarray(up1["w"]), 0.0)
    # micro-step 2: averaged gradient applied at lr 1
    up2, state = tx.update(g2, state, params)
    np.testing.assert_allclose(np.asarray(up2["w"]), [-0.5, -0.5], atol=1e-6)


def test_no_accumulation_default():
    cfg = get_default_cfg()
    cfg.SOLVER.BASE_LR = 1.0
    cfg.SOLVER.MOMENTUM = 0.0
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.STEPS = (10**9,)
    params = {"w": jnp.zeros((2,))}
    tx, _ = make_optimizer(cfg, params)
    state = tx.init(params)
    up, state = tx.update({"w": jnp.array([1.0, 1.0])}, state, params)
    np.testing.assert_allclose(np.asarray(up["w"]), -1.0, atol=1e-6)
