"""REAL multi-process gather: two OS processes form an actual
jax.distributed cluster (CPU/Gloo) and gather_objects must return both
hosts' COCO-dict payloads on each — the true multihost_utils path the
simulated test (test_aux.py) injects fakes for.  Validates the eval
prediction gather (reference utils/comm.py:48-88) end to end."""

import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

_WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    import jax
    jax.distributed.initialize(
        coordinator_address="localhost:" + port,
        num_processes=2,
        process_id=pid,
    )
    sys.path.insert(0, "@REPO@")
    from cvpr22_cross_modal_pseudo_labeling_tpu.parallel.mesh import (
        gather_objects,
    )
    obj = {"rank": pid,
           "dets": [{"image_id": 10 + pid, "rle": "ab" * (pid + 1)}]}
    merged = gather_objects(obj)
    assert len(merged) == 2, merged
    assert [m["rank"] for m in merged] == [0, 1], merged
    assert merged[1]["dets"][0]["rle"] == "abab"
    print("proc", pid, "ok")
    """
).replace(
    "@REPO@", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def test_two_process_gather(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "",  # no virtual-device mesh in the workers
    }
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "12399"],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert any("proc 0 ok" in o for o in outs)
    assert any("proc 1 ok" in o for o in outs)
