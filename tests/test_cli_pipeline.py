"""The documented 3-stage pipeline driven through the real CLIs with
ORBAX checkpoint chaining (docs/getting_started.md): MMSS pretraining
-> teacher (MODEL.WEIGHT = the MMSS run's OUTPUT_DIR) -> student
(MODEL.WEIGHT = the teacher run, MODEL.LANGUAGE_WEIGHT = the MMSS run).

The reference chains these stages through torch .pth files
(README.md:55-80 + utils/checkpoint.py:132-154); here every stage
produces an orbax directory, so cross-stage import must work in this
framework's own vocabulary (engine/checkpoint.py::import_flax_params).
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS = os.path.join(REPO, ".claude", "skills", "verify", "assets")
DATA = "/tmp/verify_st/data"


def _cli_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["CMPL_TPU_DATA_DIR"] = DATA
    env["XLA_FLAGS"] = ""
    return env


def _train(config, out_dir, env, *opts):
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "train_net.py"),
        "--config-file", os.path.join(ASSETS, config),
        "--skip-test",
        *opts,
        "OUTPUT_DIR", out_dir,
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True,
        timeout=1800,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    return out


@pytest.mark.skipif(
    not os.path.exists(os.path.join(ASSETS, "gen_coco.py")),
    reason="verify assets missing",
)
def test_three_stage_orbax_pipeline(tmp_path):
    env = _cli_env()
    subprocess.run(
        [sys.executable, os.path.join(ASSETS, "gen_coco.py")],
        check=True, env=env,
    )
    mmss_dir = str(tmp_path / "mmss")
    zs_dir = str(tmp_path / "teacher")
    st_dir = str(tmp_path / "student")

    # stage 1: MMSS pretraining -> orbax checkpoint
    _train("tiny_mmss.yaml", mmss_dir, env)
    assert os.path.exists(os.path.join(mmss_dir, "last_checkpoint"))

    # stage 2: teacher from the MMSS run (v2l -> emb_pred surgery)
    log = _train(
        "tiny_zs.yaml", zs_dir, env,
        "MODEL.WEIGHT", mmss_dir,
        "MODEL.LOAD_EMB_PRED_FROM_MMSS_HEAD", "True",
        # random-init heads diverge fast; keep the steps tame
        "SOLVER.BASE_LR", "1e-6",
        "SOLVER.ABORT_ON_NON_FINITE", "False",
    )
    m = re.search(r"imported (\d+) leaves from orbax checkpoint", log)
    assert m, log[-4000:]
    assert int(m.group(1)) > 100  # full R-50 trunk + v2l
    # the C5 MMSS layer4 must land on the RoI extractor, not vanish
    assert "backbone/body/layer4" not in log

    # stage 3: student from the teacher run; BERT table from the MMSS
    # run (a teacher checkpoint carries no language backbone)
    log = _train(
        "tiny_st.yaml", st_dir, env,
        "MODEL.WEIGHT", zs_dir,
        "MODEL.LANGUAGE_WEIGHT", mmss_dir,
        "SOLVER.BASE_LR", "1e-6",
        "SOLVER.ABORT_ON_NON_FINITE", "False",
    )
    m = re.search(r"imported (\d+) leaves from orbax checkpoint", log)
    assert m and int(m.group(1)) > 100, log[-4000:]
    m = re.search(r"language table: imported (\d+) leaves", log)
    assert m and int(m.group(1)) >= 1, log[-4000:]
    assert re.search(r"prepare_model: copied \d+ teacher leaves", log)
    assert "total_loss" in log
