"""Unit tests for tools/tpu_probe.py (mocked subprocess — never touches
the real device; the tool exists precisely because unbounded device
contact can wedge the tunneled runtime)."""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import tpu_probe  # noqa: E402


def _mk(phase, **kw):
  return json.dumps(dict(phase=phase, **kw))


class _FakePopen:
  """Stands in for subprocess.Popen: scripted stdout/stderr/rc, with an
  optional timeout on the first communicate() and an optionally
  unkillable child (second communicate also times out)."""

  def __init__(self, stdout="", stderr="", rc=0, times_out=False,
               unkillable=False):
    self._stdout, self._stderr, self.returncode = stdout, stderr, rc
    self._times_out, self._unkillable = times_out, unkillable
    self.killed = False

  def __call__(self, cmd, stdout, stderr, text):
    return self

  def communicate(self, timeout=None):
    if self._times_out and not self.killed:
      raise subprocess.TimeoutExpired("cmd", timeout, output=self._stdout)
    if self.killed and self._unkillable:
      raise subprocess.TimeoutExpired("cmd", timeout, output=self._stdout)
    return self._stdout, self._stderr

  def kill(self):
    self.killed = True


def _result_line(ok=True, platform="axon", **kw):
  d = dict(phase="result", ok=ok, error=None, platform=platform,
           n_devices=1, device="TPU v5 lite0", init_s=2.0, op_s=0.1)
  d.update(kw)
  return json.dumps(d)


def test_healthy(monkeypatch):
  out = "\n".join([_mk("init-start"),
                   _mk("init-done", init_s=2.0, platform="axon"),
                   _result_line()])
  monkeypatch.setattr(subprocess, "Popen", _FakePopen(stdout=out))
  res, rc = tpu_probe.probe(60)
  assert rc == 0 and res["ok"] and res["n_devices"] == 1


def test_cpu_fallback_is_unhealthy(monkeypatch):
  # sitecustomize registers "axon,cpu": a soft axon failure yields CPU
  # devices and a working matmul — must NOT read as a healthy TPU.
  out = "\n".join([
      _mk("init-start"), _mk("init-done", init_s=0.1, platform="cpu"),
      _result_line(ok=False, platform="cpu",
                   error="fell back to platform='cpu' (axon backend "
                         "not initialized)")])
  monkeypatch.setattr(subprocess, "Popen", _FakePopen(stdout=out))
  res, rc = tpu_probe.probe(60)
  assert rc == 3 and not res["ok"] and "fell back" in res["error"]


def test_op_failed(monkeypatch):
  out = _result_line(ok=False, error=None)
  monkeypatch.setattr(subprocess, "Popen", _FakePopen(stdout=out))
  res, rc = tpu_probe.probe(60)
  assert rc == 3 and not res["ok"] and res["error"]


def test_wedged_during_init(monkeypatch):
  monkeypatch.setattr(subprocess, "Popen",
                      _FakePopen(stdout=_mk("init-start"), times_out=True))
  res, rc = tpu_probe.probe(5)
  assert rc == 2 and "device init" in res["error"]


def test_wedged_during_first_op_reports_phase(monkeypatch):
  out = "\n".join([_mk("init-start"),
                   _mk("init-done", init_s=150.0, platform="axon")])
  monkeypatch.setattr(subprocess, "Popen",
                      _FakePopen(stdout=out, times_out=True))
  res, rc = tpu_probe.probe(5)
  assert rc == 2 and "first device op" in res["error"]
  assert res["init_s"] == 150.0  # init DID complete — triage the op phase


def test_unkillable_child_still_bounded(monkeypatch):
  monkeypatch.setattr(
      subprocess, "Popen",
      _FakePopen(stdout=_mk("init-start"), times_out=True, unkillable=True))
  res, rc = tpu_probe.probe(5)
  assert rc == 2 and "device init" in res["error"]


def test_child_crash(monkeypatch):
  monkeypatch.setattr(subprocess, "Popen",
                      _FakePopen(stdout="", stderr="boom", rc=1))
  res, rc = tpu_probe.probe(5)
  assert rc == 4 and not res["ok"] and res["stderr"] == "boom"
  assert res["last_phase"] == "spawn"


def test_warning_lines_interleaved(monkeypatch):
  # axon prints experimental-platform warnings; non-JSON lines and JSON
  # without a "phase" key must be skipped, not crash the parser.
  out = "\n".join(["WARNING: platform axon is experimental",
                   _mk("init-start"),
                   '{"not_a_marker": 1}',
                   _mk("init-done", init_s=1.0, platform="axon"),
                   "I0818 some glog line",
                   _result_line()])
  monkeypatch.setattr(subprocess, "Popen", _FakePopen(stdout=out))
  res, rc = tpu_probe.probe(60)
  assert rc == 0 and res["ok"]
