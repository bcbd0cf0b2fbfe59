"""Bounded TPU-tunnel health probe. Prints ONE JSON line and exits.

The tunneled axon runtime can wedge: device init blocks indefinitely
(observed >15 min, uninterruptible inside jax.devices()) after process
overlap or an unlucky kill. Every TPU job should be preceded by (or
wrapped in) a bounded probe instead of discovering the wedge at the
first collective. This tool is that probe:

  python tools/tpu_probe.py [--timeout 300]

Exit codes: 0 healthy, 2 wedged/timeout, 3 init ok but op failed.
The JSON line carries init_s / op_s so "slow but alive" (~2-3 min init
after a prior process death) is distinguishable from "wedged".

Runs the probe in a subprocess so the timeout is enforceable even while
the child is stuck inside device init (which ignores signals delivered
to the blocked thread).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

_CHILD = r"""
import json, time
t0 = time.time()
import jax
devs = jax.devices()
init_s = round(time.time() - t0, 1)
t1 = time.time()
x = jax.numpy.ones((256, 256))
v = float((x @ x).mean())  # VALUE fetch fences through the tunnel
op_s = round(time.time() - t1, 1)
print(json.dumps({
    "ok": v == 256.0,
    "platform": devs[0].platform,
    "n_devices": len(devs),
    "device": str(devs[0]),
    "init_s": init_s,
    "op_s": op_s,
}))
"""


def probe(timeout_s: float) -> tuple[dict, int]:
  try:
    r = subprocess.run([sys.executable, "-c", _CHILD],
                       capture_output=True, text=True, timeout=timeout_s)
  except subprocess.TimeoutExpired:
    return ({"ok": False, "error": f"wedged: no device init within "
                                   f"{timeout_s:.0f}s (tunnel poisoned? "
                                   f"serialize TPU jobs and retry later)"},
            2)
  line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
  try:
    out = json.loads(line)
  except (json.JSONDecodeError, ValueError):
    return ({"ok": False, "error": "probe child failed",
             "rc": r.returncode, "stderr": r.stderr[-500:]}, 3)
  return out, 0 if out.get("ok") else 3


def main() -> int:
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--timeout", type=float, default=300.0,
                 help="seconds before declaring the tunnel wedged "
                      "(default 300; normal init is ~2-3 min after a "
                      "prior TPU process died)")
  args = p.parse_args()
  out, rc = probe(args.timeout)
  print(json.dumps(out))
  return rc


if __name__ == "__main__":
  sys.exit(main())
