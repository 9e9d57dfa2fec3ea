import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cvpr22_cross_modal_pseudo_labeling_tpu.config import get_default_cfg
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.checkpoint import (
    latest_checkpoint,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
    create_train_state,
)
from cvpr22_cross_modal_pseudo_labeling_tpu.engine.trainer import do_train
from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import make_mesh


class FakeLoader:
    def __init__(self, n_batches):
        self.n = n_batches

    def __iter__(self):
        for i in range(self.n):
            yield {
                "images": np.ones((8, 4, 4, 3), np.float32) * i
            }, list(range(8))


def test_do_train_loop(tmp_path):
    cfg = get_default_cfg()
    cfg.SOLVER.MAX_ITER = 5
    cfg.SOLVER.LOG_PERIOD = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 4
    cfg.SOLVER.TEST_PERIOD = 3
    cfg.OUTPUT_DIR = str(tmp_path)

    params = {"params": {"w": jnp.ones((3,))}}
    tx = optax.sgd(0.1)
    state = create_train_state(params, tx, jax.random.PRNGKey(0))
    mesh = make_mesh(("data",), (-1,))

    evals = []

    def step(state, batch):
        grads = {"params": {"w": jnp.ones((3,))}}
        from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
            _apply_update,
        )

        new_state = _apply_update(state, grads, tx)
        return new_state, {"total_loss": jnp.sum(batch["images"])}

    final = do_train(
        jax.jit(step),
        state,
        FakeLoader(10),
        mesh,
        cfg,
        eval_fn=lambda s, it: evals.append(it),
        output_dir=str(tmp_path),
    )
    assert int(final.step) == 5  # stopped at MAX_ITER
    assert evals == [3]
    assert latest_checkpoint(str(tmp_path)) is not None
    assert os.path.exists(tmp_path / "tb" / "metrics.jsonl")
