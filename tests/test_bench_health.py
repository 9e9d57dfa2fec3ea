"""Unit tests for the TPU health probe (tools/tpu_health.py) and the
bench orchestrator's backend-outage handling (bench.py).

These pin the failure-classification behavior around the axon
loopback relay: a dead relay must be diagnosed in seconds (not the
~28-minute in-runtime retry), a CPU-backend fallback must never be
reported as a healthy TPU, and malformed operator input must not
crash the bench before it emits its JSON line.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from tools import tpu_health  # noqa: E402


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_probe_ports_open_and_refused():
    listener = socket.socket()
    listener.bind(("127.0.0.1", 0))
    listener.listen(1)
    open_port = listener.getsockname()[1]
    closed_port = _free_port()
    try:
        out = tpu_health.probe_ports(ports=(open_port, closed_port))
    finally:
        listener.close()
    assert out[str(open_port)] == "open"
    assert out[str(closed_port)] == "ConnectionRefusedError"


class _Proc:
    def __init__(self, stdout, returncode=0, stderr=""):
        self.stdout = stdout
        self.returncode = returncode
        self.stderr = stderr


def test_attach_probe_ignores_stdout_log_noise(monkeypatch):
    # the runtime can append log lines after the probe's JSON — the
    # parse must pick the JSON list, not the last line
    monkeypatch.setattr(
        tpu_health.subprocess,
        "run",
        lambda *a, **k: _Proc('["TPU v5 lite"]\nI0000 grpc shutdown\n'),
    )
    status, devices = tpu_health.attach_probe(timeout=5)
    assert status == "ok"
    assert devices == ["TPU v5 lite"]


def test_attach_probe_failure_paths(monkeypatch):
    monkeypatch.setattr(
        tpu_health.subprocess,
        "run",
        lambda *a, **k: _Proc("", returncode=1, stderr="boom"),
    )
    assert tpu_health.attach_probe(timeout=5) == ("failed", [])

    def _raise(*a, **k):
        raise subprocess.TimeoutExpired(cmd="x", timeout=5)

    monkeypatch.setattr(tpu_health.subprocess, "run", _raise)
    assert tpu_health.attach_probe(timeout=5) == ("timeout", [])


def _run_main(monkeypatch, capsys, argv, env=None, attach=None, ports=None):
    monkeypatch.setattr(sys, "argv", ["tpu_health.py"] + argv)
    for k in ("PALLAS_AXON_POOL_IPS",):
        monkeypatch.delenv(k, raising=False)
    for k, v in (env or {}).items():
        monkeypatch.setenv(k, v)
    if attach is not None:
        monkeypatch.setattr(tpu_health, "attach_probe", lambda t: attach)
    if ports is not None:
        monkeypatch.setattr(
            tpu_health, "probe_ports", lambda *a, **k: ports
        )
    rc = tpu_health.main()
    return rc, json.loads(capsys.readouterr().out.strip())


def test_cpu_fallback_is_not_healthy(monkeypatch, capsys):
    # jax silently falls back to the CPU backend when the TPU plugin
    # fails init; the probe must not call that a healthy TPU
    rc, out = _run_main(
        monkeypatch, capsys, [], attach=("ok", ["cpu"]),
        ports={"8081": "ConnectionRefusedError"},
    )
    assert out["healthy"] is False and rc == 1


def test_tpu_attach_is_healthy(monkeypatch, capsys):
    rc, out = _run_main(
        monkeypatch, capsys, [], attach=("ok", ["TPU v5 lite"]),
        ports={"8081": "open"},
    )
    assert out["healthy"] is True and rc == 0
    assert out["devices"] == ["TPU v5 lite"]


def test_ports_only_non_axon_host_is_healthy(monkeypatch, capsys):
    # no axon env var -> no relay exists and none is needed; refused
    # ports must not fail scripted callers keying on the exit code
    rc, out = _run_main(
        monkeypatch, capsys, ["--ports-only"],
        ports={"8081": "ConnectionRefusedError"},
    )
    assert out["healthy"] is True and rc == 0
    assert out["devices"] == []


def test_ports_only_axon_host_relay_down_unhealthy(monkeypatch, capsys):
    rc, out = _run_main(
        monkeypatch, capsys, ["--ports-only"],
        env={"PALLAS_AXON_POOL_IPS": "10.0.0.1"},
        ports={"8081": "ConnectionRefusedError"},
    )
    assert out["healthy"] is False and rc == 1
    assert out["devices"] == []


def test_relay_down_skips_attach_and_reports_devices_key(
    monkeypatch, capsys
):
    called = []
    monkeypatch.setattr(
        tpu_health,
        "attach_probe",
        lambda t: called.append(1) or ("ok", ["TPU v5 lite"]),
    )
    rc, out = _run_main(
        monkeypatch, capsys, [],
        env={"PALLAS_AXON_POOL_IPS": "10.0.0.1"},
        ports={"8081": "ConnectionRefusedError"},
    )
    assert out["attach"] == "skipped" and not called
    assert out["devices"] == [] and out["healthy"] is False


# ---------------------------------------------------------------------------
# bench.py orchestrator
# ---------------------------------------------------------------------------

def test_bench_relay_up_trivially_true_off_axon(monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert bench._relay_up() is True


def test_bench_relay_up_uses_shared_probe(monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setattr(
        tpu_health, "probe_ports", lambda *a, **k: {"8081": "open"}
    )
    assert bench._relay_up() is True
    monkeypatch.setattr(
        tpu_health,
        "probe_ports",
        lambda *a, **k: {"8081": "ConnectionRefusedError"},
    )
    assert bench._relay_up() is False


@pytest.mark.parametrize(
    "raw, expect",
    [("5", 5), ("none", 3), ("", 3), ("0", 1), ("-2", 1)],
)
def test_bench_retries_from_env(monkeypatch, raw, expect):
    if raw == "":
        monkeypatch.delenv("BENCH_UNAVAILABLE_RETRIES", raising=False)
    else:
        monkeypatch.setenv("BENCH_UNAVAILABLE_RETRIES", raw)
    assert bench._retries_from_env() == expect


def test_bench_main_fast_fails_when_relay_down(monkeypatch, capsys):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setattr(
        tpu_health,
        "probe_ports",
        lambda *a, **k: {"8081": "ConnectionRefusedError"},
    )
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0
    assert "relay down" in out["headline_note"]
    assert out["secondary_note"].startswith("skipped")


def test_bench_secondaries_skipped_after_unavailable(monkeypatch, capsys):
    """An UNAVAILABLE stale-lease failure in one secondary must skip the
    rest instead of blocking against the dead backend serially."""
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.delenv("BENCH_SKIP_EXTRA", raising=False)
    monkeypatch.setattr(sys, "argv", ["bench.py"])

    calls = []

    def fake_sub_bench(args, timeout=3600):
        calls.append(os.path.basename(args[0]))
        if "bench.py" in args[0]:
            return {
                "metric": "m", "value": 1.0, "unit": "u",
                "vs_baseline": 1.0,
            }
        err = RuntimeError("no JSON output (rc=1): ...")
        err.full_stderr = "UNAVAILABLE: TPU backend setup/compile error"
        raise err

    monkeypatch.setattr(bench, "_sub_bench", fake_sub_bench)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    # headline ran, first secondary failed UNAVAILABLE, second skipped
    assert calls == ["bench.py", "bench_mmss.py"]
    assert "UNAVAILABLE" in out["mmss_b64_note"] or "RuntimeError" in out[
        "mmss_b64_note"
    ]
    assert out["st_distill_note"] == "skipped: backend unavailable"


def test_bench_secondaries_skipped_when_relay_dies_midrun(
    monkeypatch, capsys
):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.delenv("BENCH_SKIP_EXTRA", raising=False)
    monkeypatch.setattr(sys, "argv", ["bench.py"])

    # relay up for the headline pre-check, down for every later probe
    states = iter([{"8081": "open"}])
    monkeypatch.setattr(
        tpu_health,
        "probe_ports",
        lambda *a, **k: next(
            states, {"8081": "ConnectionRefusedError"}
        ),
    )

    calls = []

    def fake_sub_bench(args, timeout=3600):
        calls.append(os.path.basename(args[0]))
        return {
            "metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 1.0,
        }

    monkeypatch.setattr(bench, "_sub_bench", fake_sub_bench)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert calls == ["bench.py"]  # no secondary subprocess launched
    assert out["mmss_b64_note"] == "skipped: relay went down"
    assert out["st_distill_note"] == "skipped: relay went down"
