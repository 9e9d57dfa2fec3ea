"""CLI-level checkpoint-resume drive (the round-2 VERDICT headline fix).

Runs the real ``tools/train_net.py`` binary on the synthetic COCO tree
(.claude/skills/verify/assets/gen_coco.py) three times in one
OUTPUT_DIR and asserts the reference resume semantics
(reference engine/trainer.py:94 + data/build.py:115: start_iter is
threaded into the sampler, so a resumed run trains exactly
MAX_ITER - start_iter steps):

1. fresh run, MAX_ITER=1  -> 1 step, checkpoint at iteration 1;
2. rerun with MAX_ITER=4  -> resumes at 1, trains steps 2..4 exactly;
3. rerun with MAX_ITER=4  -> already complete, trains ZERO steps.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS = os.path.join(REPO, ".claude", "skills", "verify", "assets")
DATA = "/tmp/verify_st/data"


def _cli_env():
    env = dict(os.environ)
    # force the in-process CPU platform for the subprocess (the
    # container's sitecustomize registers the remote axon TPU backend
    # whenever PALLAS_AXON_POOL_IPS is set)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["CMPL_TPU_DATA_DIR"] = DATA
    # one program, no virtual multi-device mesh: faster CPU compiles
    env["XLA_FLAGS"] = ""
    return env


def _run_train(out_dir, max_iter, env, extra_opts=()):
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "train_net.py"),
        "--config-file", os.path.join(ASSETS, "tiny_zs.yaml"),
        "--skip-test",
        *extra_opts,
        "SOLVER.MAX_ITER", str(max_iter),
        "SOLVER.CHECKPOINT_PERIOD", "1",
        "SOLVER.LOG_PERIOD", "1",
        # random-init training diverges within a few steps (FrozenBN is
        # identity at init; matches the reference, which always loads
        # pretrained weights) — this test is about resume step
        # accounting, so keep updates tiny and don't trip the NaN abort
        "SOLVER.BASE_LR", "1e-6",
        "SOLVER.ABORT_ON_NON_FINITE", "False",
        "OUTPUT_DIR", out_dir,
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc.stdout + proc.stderr


def _logged_steps(out_dir):
    path = os.path.join(out_dir, "tb", "metrics.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line)["step"] for line in f if line.strip()]


@pytest.mark.skipif(
    not os.path.exists(os.path.join(ASSETS, "gen_coco.py")),
    reason="verify assets missing",
)
def test_cli_resume_trains_exact_step_budget(tmp_path):
    env = _cli_env()
    subprocess.run(
        [sys.executable, os.path.join(ASSETS, "gen_coco.py")],
        check=True, env=env,
    )
    out_dir = str(tmp_path / "out")

    # 1. fresh 1-iter run
    _run_train(out_dir, max_iter=1, env=env)
    assert _logged_steps(out_dir) == [1]

    # 2. mid-run resume: budget raised to 4 -> exactly steps 2..4
    log = _run_train(out_dir, max_iter=4, env=env)
    assert "resumed from" in log and "at iteration 1" in log
    assert _logged_steps(out_dir) == [1, 2, 3, 4]
    ckpts = sorted(
        d for d in os.listdir(out_dir) if d.startswith("model_")
    )
    assert ckpts[-1] == "model_0000004"

    # 3. completed run relaunched -> ZERO additional steps, no new
    #    checkpoints (the round-2 defect logged "iter 5/4" here)
    log = _run_train(out_dir, max_iter=4, env=env)
    assert "training already complete" in log
    assert _logged_steps(out_dir) == [1, 2, 3, 4]
    assert sorted(
        d for d in os.listdir(out_dir) if d.startswith("model_")
    ) == ckpts

    # 4. lazy MODEL.WEIGHT resolution: a resumed run restores params
    #    from the checkpoint wholesale, so an unreachable init-weight
    #    URL must not be fetched (reference checkpoint.py:55-63 likewise
    #    ignores MODEL.WEIGHT once a checkpoint exists)
    bogus = "https://nonexistent.invalid/init_weights.pth"
    log = _run_train(
        out_dir, max_iter=4, env=env,
        extra_opts=["MODEL.WEIGHT", bogus],
    )
    assert "training already complete" in log
    assert _logged_steps(out_dir) == [1, 2, 3, 4]

    # 5. same contract on the eval CLI: a trained-checkpoint eval never
    #    touches the init-weight URL
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "test_net.py"),
        "--config-file", os.path.join(ASSETS, "tiny_zs.yaml"),
        "OUTPUT_DIR", out_dir,
        "MODEL.WEIGHT", bogus,
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True,
        timeout=1200,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    assert "loaded orbax checkpoint" in out
    assert "eval[" in out


@pytest.mark.skipif(
    not os.path.exists(os.path.join(ASSETS, "gen_coco.py")),
    reason="verify assets missing",
)
def test_cli_resume_grain_stream_position(tmp_path):
    """Same CLI drive through the grain pipeline
    (DATALOADER.USE_GRAIN True): the checkpoint carries the stream
    position (staged with the save by the DevicePrefetcher snapshot, so
    it reflects the CONSUMED batch, not the prefetch-ahead one) and the
    resumed run restores it instead of start_iter fast-forwarding."""
    env = _cli_env()
    subprocess.run(
        [sys.executable, os.path.join(ASSETS, "gen_coco.py")],
        check=True, env=env,
    )
    out_dir = str(tmp_path / "out")
    grain = ("DATALOADER.USE_GRAIN", "True")

    _run_train(out_dir, max_iter=1, env=env, extra_opts=grain)
    assert _logged_steps(out_dir) == [1]
    # the published checkpoint staged the post-batch-1 stream position
    assert os.path.exists(os.path.join(out_dir, "loader_state.json"))
    with open(os.path.join(out_dir, "loader_state.json")) as f:
        state1 = json.load(f)

    log = _run_train(out_dir, max_iter=3, env=env, extra_opts=grain)
    assert "data stream resumed from loader_state.json" in log
    assert _logged_steps(out_dir) == [1, 2, 3]
    with open(os.path.join(out_dir, "loader_state.json")) as f:
        state3 = json.load(f)
    # the stream advanced exactly 2 more batches between publishes
    assert state1 != state3
