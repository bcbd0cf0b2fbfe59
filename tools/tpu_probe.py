"""Bounded TPU-tunnel health probe. Prints ONE JSON line and exits.

The tunneled axon runtime can wedge: device init blocks indefinitely
(observed >15 min, uninterruptible inside jax.devices()) after process
overlap or an unlucky kill. Every TPU job should be preceded by (or
wrapped in) a bounded probe instead of discovering the wedge at the
first collective. This tool is that probe:

  python tools/tpu_probe.py [--timeout 300]

Exit codes: 0 healthy TPU, 2 wedged/timeout, 3 device reachable but
unhealthy (op failed, or JAX silently fell back to CPU — NOT a healthy
TPU even though ops succeed), 4 probe child crashed (import/init
exception before producing a result). The JSON line carries init_s /
op_s so "slow but alive" (~2-3 min init after a prior process death) is
distinguishable from "wedged", and on timeout reports WHICH phase
(device init vs first op) never completed.

Runs the probe in a subprocess so the timeout is enforceable even while
the child is stuck inside device init (which ignores signals delivered
to the blocked thread). The child emits one flushed phase-marker line
per milestone; on timeout the parent reads the partial output to name
the wedged phase, SIGKILLs the child, and bounds the reap itself (a
child stuck in an uninterruptible kernel wait must not hang the tool
that promises boundedness).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

_CHILD = r"""
import json, time
def mark(**kw):
  print(json.dumps(kw), flush=True)
mark(phase="init-start")
t0 = time.time()
import jax
devs = jax.devices()
init_s = round(time.time() - t0, 1)
platform = devs[0].platform
mark(phase="init-done", init_s=init_s, platform=platform)
t1 = time.time()
x = jax.numpy.ones((256, 256))
v = float((x @ x).mean())  # VALUE fetch fences through the tunnel
op_s = round(time.time() - t1, 1)
# sitecustomize registers "axon,cpu": if axon init failed softly, devices()
# can come back CPU and the matmul "succeeds" — that is a dead tunnel, not
# a healthy TPU.
on_tpu = platform in ("axon", "tpu")
mark(phase="result",
     ok=bool(v == 256.0 and on_tpu),
     error=None if on_tpu else f"fell back to platform={platform!r} "
                               "(axon backend not initialized)",
     platform=platform,
     n_devices=len(devs),
     device=str(devs[0]),
     init_s=init_s,
     op_s=op_s)
"""


def _last_marker(stdout: str) -> dict:
  last = {}
  for line in stdout.splitlines():
    line = line.strip()
    if line.startswith("{"):
      try:
        d = json.loads(line)
      except json.JSONDecodeError:
        continue
      if "phase" in d:
        last = d
  return last


def probe(timeout_s: float) -> tuple[dict, int]:
  p = subprocess.Popen([sys.executable, "-c", _CHILD],
                       stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                       text=True)
  try:
    out, err = p.communicate(timeout=timeout_s)
  except subprocess.TimeoutExpired as e:
    p.kill()
    try:
      out, err = p.communicate(timeout=30)
    except subprocess.TimeoutExpired:
      # Child unkillable (uninterruptible kernel wait in the tunnel's
      # device path) — report with whatever partial output the
      # TimeoutExpired captured and leave the zombie behind.
      out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
          else (e.stdout or "")
    marker = _last_marker(out or "")
    phase = marker.get("phase", "spawn")
    wedged_at = {"spawn": "child never started jax import",
                 "init-start": "device init (jax.devices())",
                 "init-done": "first device op / value fetch",
                 }.get(phase, phase)
    res = {"ok": False,
           "error": f"wedged in {wedged_at}: no result within "
                    f"{timeout_s:.0f}s (tunnel poisoned? serialize TPU "
                    "jobs and retry later)"}
    if "init_s" in marker:
      res["init_s"] = marker["init_s"]
      res["platform"] = marker.get("platform")
    return res, 2
  marker = _last_marker(out or "")
  if marker.get("phase") != "result":
    return ({"ok": False,
             "error": "probe child crashed before producing a result",
             "last_phase": marker.get("phase", "spawn"),
             "rc": p.returncode, "stderr": (err or "")[-500:]}, 4)
  marker.pop("phase")
  if not marker.get("ok"):
    if not marker.get("error"):  # key exists but None on the op-value path
      marker["error"] = "device op produced a wrong value"
    return marker, 3
  return marker, 0


def main() -> int:
  ap = argparse.ArgumentParser(description=__doc__)
  ap.add_argument("--timeout", type=float, default=300.0,
                  help="seconds before declaring the tunnel wedged "
                       "(default 300; normal init is ~2-3 min after a "
                       "prior TPU process died)")
  args = ap.parse_args()
  t0 = time.time()
  out, rc = probe(args.timeout)
  out["probe_s"] = round(time.time() - t0, 1)
  print(json.dumps(out))
  return rc


if __name__ == "__main__":
  sys.exit(main())
