"""TPU backend health probe.

Prints ONE JSON line describing whether the TPU is reachable, without
risking an unbounded hang in the calling process:

  {"relay_ports": {...}, "attach": "ok|failed|timeout|skipped",
   "devices": [...], "healthy": bool}

Two layers, cheapest first:

1. TCP probe of the axon loopback-relay ports (8081 monoclient, 8082
   bincode, 8083 init).  All-refused means the relay process is down —
   no client can attach, and attach attempts block for ~28 minutes
   inside the runtime's internal retry before failing UNAVAILABLE (see
   BENCH_NOTES.json "round3_tunnel_outage"), so the expensive layer is
   skipped in that case.
2. A SUBPROCESS `jax.devices()` attach with a hard timeout (default
   120s), so a half-dead backend cannot hang the caller: the probe
   process is killed, not the operator's shell.  The attach runs in a
   child because a failed/killed axon client poisons its own process
   state, never the parent's.

Usage:
  python tools/tpu_health.py                 # ports + bounded attach
  python tools/tpu_health.py --ports-only    # just the TCP probe
  python tools/tpu_health.py --timeout 300   # patient attach
"""

import argparse
import json
import os
import socket
import subprocess
import sys

RELAY_PORTS = (8081, 8082, 8083)

_ATTACH_SNIPPET = (
    "import jax, json; "
    "print(json.dumps([str(d.device_kind) for d in jax.devices()]))"
)


def probe_ports(host="127.0.0.1", ports=RELAY_PORTS, timeout=3.0):
    out = {}
    for port in ports:
        s = socket.socket()
        s.settimeout(timeout)
        try:
            s.connect((host, port))
            out[str(port)] = "open"
        except Exception as e:
            out[str(port)] = type(e).__name__
        finally:
            s.close()
    return out


def attach_probe(timeout):
    """(status, devices) — jax.devices() in a killable subprocess."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _ATTACH_SNIPPET],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return "timeout", []
    if proc.returncode != 0:
        sys.stderr.write((proc.stderr or "")[-400:] + "\n")
        return "failed", []
    # the runtime may append log noise to stdout after the probe's JSON
    # list — parse the last line that looks like one, not the last line
    lines = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("[")
    ]
    try:
        return "ok", json.loads(lines[-1])  # e.g. ["TPU v5 lite"]
    except Exception:
        return "failed", []


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ports-only", action="store_true")
    p.add_argument("--timeout", type=float, default=120.0)
    args = p.parse_args()

    ports = probe_ports()
    relay_up = any(v == "open" for v in ports.values())
    result = {"relay_ports": ports}

    on_axon = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
    if args.ports_only:
        result["attach"] = "skipped"
        result["devices"] = []
        # the relay only exists on axon-tunnel hosts; elsewhere refused
        # ports say nothing about the TPU
        result["healthy"] = relay_up or not on_axon
        if not on_axon:
            result["attach_note"] = "not an axon host; no relay expected"
    elif not relay_up and on_axon:
        # relay down: an attach attempt would block ~28 min inside the
        # runtime before failing — do not bother
        result["attach"] = "skipped"
        result["attach_note"] = "relay ports all refused"
        result["devices"] = []
        result["healthy"] = False
    else:
        status, devices = attach_probe(args.timeout)
        result["attach"] = status
        result["devices"] = devices
        # jax.devices() silently falls back to the CPU backend when the
        # TPU plugin fails init — an attach only counts if the devices
        # really are TPUs
        result["healthy"] = (
            status == "ok"
            and bool(devices)
            and all("tpu" in str(d).lower() for d in devices)
        )

    print(json.dumps(result))
    return 0 if result["healthy"] else 1


if __name__ == "__main__":
    sys.exit(main())
