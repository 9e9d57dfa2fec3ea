"""The driver gate under test (VERDICT r4 #2).

Round 4 shipped a red `MULTICHIP` artifact because nothing in the suite
ever ran `__graft_entry__.dryrun_multichip`.  This module closes that
hole: the fast tier at least imports the entry module (catching import
rot), and the slow tier executes the real gate — the exact function the
driver calls, at production table ranks (COCO 49 / LVIS 1203 / BERT
30522 / emb 768), over an 8-virtual-CPU-device hybrid mesh — in a
subprocess with a reduced image bucket (CMPL_DRYRUN_BUCKET shrinks conv
FLOPs only; every sharding layout under test is unchanged).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_graft_entry_importable_and_complete():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    assert callable(g.entry)
    assert callable(g.dryrun_multichip)


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    """Run the driver gate verbatim.  A failure here is exactly the
    failure MULTICHIP_r{N}.json would record."""
    env = dict(os.environ)
    env["CMPL_DRYRUN_BUCKET"] = "128,160"
    # the dryrun configures its own virtual CPU backend; clear the test
    # harness flags so the subprocess starts clean
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed:\n--- stdout ---\n{proc.stdout}"
        f"\n--- stderr ---\n{proc.stderr[-4000:]}"
    )
    assert "dryrun_multichip(8) OK" in proc.stdout
