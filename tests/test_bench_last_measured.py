"""Unit tests for bench.py's prior-round lookup (_last_measured): the
watchdog's error JSON must carry the last GENUINE measurement — skipping
prior rounds that themselves errored/wedged (whose parsed line is the
watchdog's synthetic value-0.0 record) and ordering rounds numerically
(lexicographic sort misplaces r100 between r10 and r11)."""

import importlib.util
import json
import os

import pytest

_ROOT = os.path.join(os.path.dirname(__file__), "..")
_spec = importlib.util.spec_from_file_location(
    "bench_under_test", os.path.join(_ROOT, "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)  # safe: main() is __main__-gated

pytestmark = pytest.mark.fast


def _write(d, n, parsed, rc=0):
  rec = {"n": n, "rc": rc, "parsed": parsed}
  with open(os.path.join(d, f"BENCH_r{n:02d}.json"), "w") as f:
    json.dump(rec, f)


def _measured(value):
  return {"metric": "m", "value": value, "unit": "u",
          "vs_baseline": round(value / 1280.0, 3)}


def _errored():
  return {"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0,
          "error": "watchdog: no result after 1800s"}


def test_empty_dir_returns_none(tmp_path):
  assert bench._last_measured(str(tmp_path)) is None


def test_picks_most_recent_measured(tmp_path):
  _write(str(tmp_path), 1, _measured(1000.0))
  _write(str(tmp_path), 2, _measured(1984.0))
  got = bench._last_measured(str(tmp_path))
  assert got["file"] == "BENCH_r02.json" and got["value"] == 1984.0


def test_skips_errored_rounds(tmp_path):
  """A wedged round N must not become round N+1's 'last measured' 0.0."""
  _write(str(tmp_path), 1, _measured(1984.0))
  _write(str(tmp_path), 2, _errored(), rc=2)
  got = bench._last_measured(str(tmp_path))
  assert got["file"] == "BENCH_r01.json" and got["value"] == 1984.0


def test_all_errored_returns_none(tmp_path):
  _write(str(tmp_path), 1, _errored(), rc=2)
  assert bench._last_measured(str(tmp_path)) is None


def test_numeric_round_ordering(tmp_path):
  """r100 sorts after r99 numerically; lexicographically it lands between
  r10 and r11 and the stale r99 number would be reported."""
  for n in (9, 10, 11, 99):
    _write(str(tmp_path), n, _measured(float(n)))
  rec = {"n": 100, "rc": 0, "parsed": _measured(2048.0)}
  with open(os.path.join(str(tmp_path), "BENCH_r100.json"), "w") as f:
    json.dump(rec, f)
  got = bench._last_measured(str(tmp_path))
  assert got["file"] == "BENCH_r100.json" and got["value"] == 2048.0


def test_corrupt_record_skipped(tmp_path):
  _write(str(tmp_path), 1, _measured(1984.0))
  with open(os.path.join(str(tmp_path), "BENCH_r02.json"), "w") as f:
    f.write("{not json")
  got = bench._last_measured(str(tmp_path))
  assert got["file"] == "BENCH_r01.json"
