"""Unit tests for tools/tpu_probe.py (mocked subprocess — never touches
the real device; the tool exists precisely because unbounded device
contact can wedge the tunneled runtime)."""

import json
import os
import subprocess
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import tpu_probe  # noqa: E402


def _fake_run(stdout="", rc=0, stderr="", raise_timeout=False):
  def run(cmd, capture_output, text, timeout):
    if raise_timeout:
      raise subprocess.TimeoutExpired(cmd, timeout)
    return types.SimpleNamespace(stdout=stdout, stderr=stderr,
                                 returncode=rc)
  return run


def test_healthy(monkeypatch):
  payload = {"ok": True, "platform": "axon", "n_devices": 1,
             "device": "TPU", "init_s": 2.0, "op_s": 0.1}
  monkeypatch.setattr(subprocess, "run",
                      _fake_run(stdout=json.dumps(payload) + "\n"))
  out, rc = tpu_probe.probe(60)
  assert rc == 0 and out["ok"] and out["n_devices"] == 1


def test_wedged_timeout(monkeypatch):
  monkeypatch.setattr(subprocess, "run", _fake_run(raise_timeout=True))
  out, rc = tpu_probe.probe(5)
  assert rc == 2 and not out["ok"] and "wedged" in out["error"]


def test_child_crash(monkeypatch):
  monkeypatch.setattr(subprocess, "run",
                      _fake_run(stdout="", rc=1, stderr="boom"))
  out, rc = tpu_probe.probe(5)
  assert rc == 3 and not out["ok"] and out["stderr"] == "boom"


def test_op_failed(monkeypatch):
  payload = {"ok": False, "platform": "axon", "n_devices": 1,
             "device": "TPU", "init_s": 2.0, "op_s": 0.1}
  monkeypatch.setattr(subprocess, "run",
                      _fake_run(stdout=json.dumps(payload) + "\n"))
  out, rc = tpu_probe.probe(60)
  assert rc == 3 and not out["ok"]


def test_warning_lines_before_json(monkeypatch):
  # axon prints experimental-platform warnings; the tool must parse the
  # LAST stdout line as the payload.
  payload = json.dumps({"ok": True, "platform": "axon", "n_devices": 1,
                        "device": "TPU", "init_s": 1.0, "op_s": 0.1})
  monkeypatch.setattr(
      subprocess, "run",
      _fake_run(stdout="WARNING: platform axon is experimental\n"
                       + payload + "\n"))
  out, rc = tpu_probe.probe(60)
  assert rc == 0 and out["ok"]
