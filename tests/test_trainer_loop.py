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


def _counting_setup(tmp_path, max_iter):
    cfg = get_default_cfg()
    cfg.SOLVER.MAX_ITER = max_iter
    cfg.SOLVER.LOG_PERIOD = 1
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.SOLVER.TEST_PERIOD = 0
    cfg.OUTPUT_DIR = str(tmp_path)
    params = {"params": {"w": jnp.ones((3,))}}
    tx = optax.sgd(0.1)
    state = create_train_state(params, tx, jax.random.PRNGKey(0))
    mesh = make_mesh(("data",), (-1,))
    steps = []

    def step(state, batch):
        steps.append(1)
        from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
            _apply_update,
        )

        return (
            _apply_update(state, {"params": {"w": jnp.ones((3,))}}, tx),
            {"total_loss": jnp.sum(batch["images"])},
        )

    return cfg, state, mesh, step, steps


def test_do_train_completed_run_trains_zero_steps(tmp_path):
    """Resume of a finished run (start_iter == MAX_ITER) must not step
    (the round-2 CLI-resume defect trained one extra step here)."""
    cfg, state, mesh, step, steps = _counting_setup(tmp_path, max_iter=3)
    final = do_train(
        step, state, FakeLoader(10), mesh, cfg,
        output_dir=str(tmp_path), start_iter=3,
    )
    assert steps == []
    assert int(final.step) == 0  # untouched state
    # and past-the-end positions must not step either
    do_train(
        step, state, FakeLoader(10), mesh, cfg,
        output_dir=str(tmp_path), start_iter=7,
    )
    assert steps == []


def test_do_train_aborts_on_non_finite_loss(tmp_path):
    """A diverged run must raise at the next metric fetch instead of
    logging `total_loss: nan` to MAX_ITER (round-2 weak #7)."""
    import pytest

    cfg, state, mesh, _, _ = _counting_setup(tmp_path, max_iter=10)
    cfg.SOLVER.LOG_PERIOD = 2

    def nan_step(state, batch):
        from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
            _apply_update,
        )

        new_state = _apply_update(
            state, {"params": {"w": jnp.ones((3,))}},
            optax.sgd(0.1),
        )
        loss = jnp.where(
            new_state.step >= 3, jnp.nan, 1.0
        )
        return new_state, {"total_loss": loss}

    with pytest.raises(FloatingPointError, match="iteration 4"):
        do_train(
            nan_step, state, FakeLoader(10), mesh, cfg,
            output_dir=str(tmp_path),
        )

    # opt-out keeps the reference's log-and-continue behavior
    cfg.SOLVER.ABORT_ON_NON_FINITE = False
    state2 = create_train_state(
        {"params": {"w": jnp.ones((3,))}}, optax.sgd(0.1),
        jax.random.PRNGKey(0),
    )
    final = do_train(
        nan_step, state2, FakeLoader(10), mesh, cfg,
        output_dir=str(tmp_path / "b"),
    )
    assert int(final.step) == 10


def test_non_finite_abort_does_not_publish_diverged_checkpoint(tmp_path):
    """The abort must not tag a checkpoint written AFTER the last finite
    loss observation: with CHECKPOINT_PERIOD not a multiple of
    LOG_PERIOD the pending save can hold post-divergence params, and
    publishing it would make the implicit resume restore the blow-up."""
    import pytest

    def make_nan_step(nan_from):
        def nan_step(state, batch):
            from cvpr22_cross_modal_pseudo_labeling_tpu.engine.train_step import (
                _apply_update,
            )

            new_state = _apply_update(
                state, {"params": {"w": jnp.ones((3,))}}, optax.sgd(0.1)
            )
            loss = jnp.where(new_state.step >= nan_from, jnp.nan, 1.0)
            return new_state, {"total_loss": loss}

        return nan_step

    # NaN at step 3 -> detected at iter 4; pending ckpt from iter 3 is
    # AFTER the last finite check (iter 2) -> dropped, nothing published
    cfg, state, mesh, _, _ = _counting_setup(tmp_path, max_iter=10)
    cfg.SOLVER.LOG_PERIOD = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 3
    out_a = str(tmp_path / "a")
    with pytest.raises(FloatingPointError):
        do_train(
            make_nan_step(3), state, FakeLoader(10), mesh, cfg,
            output_dir=out_a,
        )
    assert latest_checkpoint(out_a) is None
    assert not os.path.isdir(os.path.join(out_a, "model_0000003"))

    # boundary: pending ckpt at EXACTLY the last finite check must be
    # dropped — the save at iter k holds post-update-k params while the
    # finite loss at k was computed pre-update, so update k itself is
    # unvalidated (LOG=CKPT=2, NaN from step 3 -> detected at 4,
    # pending=2, last_finite=2)
    cfg.SOLVER.CHECKPOINT_PERIOD = 2
    state_c = create_train_state(
        {"params": {"w": jnp.ones((3,))}}, optax.sgd(0.1),
        jax.random.PRNGKey(0),
    )
    out_c = str(tmp_path / "c")
    with pytest.raises(FloatingPointError):
        do_train(
            make_nan_step(3), state_c, FakeLoader(10), mesh, cfg,
            output_dir=out_c,
        )
    assert latest_checkpoint(out_c) is None
    cfg.SOLVER.CHECKPOINT_PERIOD = 3

    # NaN at step 5 -> detected at iter 6; pending ckpt from iter 3
    # predates the finite check at iter 4 -> published as usual
    state2 = create_train_state(
        {"params": {"w": jnp.ones((3,))}}, optax.sgd(0.1),
        jax.random.PRNGKey(0),
    )
    out_b = str(tmp_path / "b")
    with pytest.raises(FloatingPointError):
        do_train(
            make_nan_step(5), state2, FakeLoader(10), mesh, cfg,
            output_dir=out_b,
        )
    assert latest_checkpoint(out_b) is not None
    assert latest_checkpoint(out_b).endswith("model_0000003")


def test_do_train_surplus_loader_batches_respect_max_iter(tmp_path):
    """A loader yielding more batches than MAX_ITER - start_iter (e.g. a
    stream restored behind the optimizer state) must not overrun the
    iteration budget."""
    cfg, state, mesh, step, steps = _counting_setup(tmp_path, max_iter=5)
    do_train(
        step, state, FakeLoader(10), mesh, cfg,
        output_dir=str(tmp_path), start_iter=3,
    )
    assert len(steps) == 2  # iterations 4 and 5 only
