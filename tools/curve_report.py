"""Harvest the metric-discrimination curve from a training workdir.

The in-training eval hooks (run_lib.train) write, at every snapshot
step, `<workdir>/bpd/bpd_<step>.npz` (NELBO/NLL bits-per-dim,
evaluation.compute_bpd) and
`<workdir>/samples/ckpt_<step>_<tag>/report_metrics.npz`
(FID/IS/KID, evaluation.compute_fid_and_is). This tool collates them
into one table — the "training improves the metrics" evidence the
reference's in-training eval exists for (reference run_lib.py:91-113,
whose report npz writes were dead code) — prints it, and appends one
JSON record to benchmarks/curve.jsonl.

Usage: python tools/curve_report.py <workdir> [--label=<name>]
"""

import glob
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def harvest(workdir: str) -> dict:
  rows = {}

  for p in glob.glob(os.path.join(workdir, "bpd", "bpd_*.npz")):
    step = int(re.search(r"bpd_(\d+)\.npz$", p).group(1))
    with np.load(p) as z:
      row = rows.setdefault(step, {})
      for k in z.files:
        row[k] = float(z[k])

  for p in glob.glob(os.path.join(workdir, "samples", "ckpt_*",
                                  "report_metrics.npz")):
    m = re.search(r"ckpt_(\d+)_", os.path.basename(os.path.dirname(p)))
    if not m:
      continue
    step = int(m.group(1))
    with np.load(p) as z:
      row = rows.setdefault(step, {})
      for k in z.files:
        try:
          row[k] = float(z[k])
        except (TypeError, ValueError):
          pass  # non-scalar (e.g. fid_error string)

  return dict(sorted(rows.items()))


def main():
  if len(sys.argv) < 2:
    raise SystemExit(__doc__)
  workdir = sys.argv[1]
  label = next((a.split("=", 1)[1] for a in sys.argv[2:]
                if a.startswith("--label=")), os.path.basename(
                    workdir.rstrip("/")))
  rows = harvest(workdir)
  if not rows:
    raise SystemExit(f"no bpd/ or samples/ reports under {workdir}")

  keys = sorted({k for r in rows.values() for k in r})
  hdr = ["step"] + keys
  print("\t".join(hdr))
  for step, r in rows.items():
    print("\t".join([str(step)] + [
        f"{r[k]:.4f}" if k in r else "-" for k in keys]))

  # monotonicity summary: is later-better for the headline metrics?
  def series(k):
    return [(s, r[k]) for s, r in rows.items() if k in r]

  summary = {}
  for k, better in (("fid", "lower"), ("nelbo_bpd_mean", "lower"),
                    ("nll_bpd_mean", "lower"), ("inception_score",
                                                "higher")):
    pts = series(k)
    if len(pts) >= 2:
      first, last = pts[0][1], pts[-1][1]
      improved = last < first if better == "lower" else last > first
      summary[k] = {"first": round(first, 4), "last": round(last, 4),
                    "improved": bool(improved)}

  rec = {"bench": "metric_discrimination_curve", "workdir": label,
         "rows": {str(s): {k: round(v, 5) for k, v in r.items()}
                  for s, r in rows.items()},
         "summary": summary}
  out = os.path.join(REPO, "benchmarks", "curve.jsonl")
  with open(out, "a") as f:
    f.write(json.dumps(rec) + "\n")
  print(f"\nappended -> {out}")
  print(json.dumps(summary, indent=1))


if __name__ == "__main__":
  main()
