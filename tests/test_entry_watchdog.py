"""Unit tests for __graft_entry__'s axon device-init watchdog: the
driver's entry compile check must fail loudly (exit 3 + diagnostic)
instead of hanging forever when the axon tunnel is wedged, must never
arm off-axon (tests, CPU-mesh runs), and must be disarmable."""

import importlib.util
import os
import subprocess
import sys
import textwrap
import time

import pytest

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

pytestmark = pytest.mark.fast


def _load_entry():
  spec = importlib.util.spec_from_file_location(
      "graft_entry_under_test", os.path.join(_ROOT, "__graft_entry__.py"))
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod


def test_noop_on_cpu_platform():
  """conftest pins jax_platforms=cpu — the watchdog must not arm.
  Asserted by sentinel identity: calling disarm() immediately would
  also silence a mis-armed watchdog before it fires."""
  ge = _load_entry()
  disarm = ge._arm_axon_init_watchdog(default_s=0.01)
  assert disarm is ge._NOOP_DISARM
  disarm()  # callable either way


def test_env_zero_disables(monkeypatch):
  ge = _load_entry()
  monkeypatch.setenv("ST_ENTRY_WATCHDOG_S", "0")
  disarm = ge._arm_axon_init_watchdog()
  assert disarm is ge._NOOP_DISARM


def test_wedge_exits_3_with_diagnostic():
  """Simulated wedge in a subprocess: axon-leading platform config, 1s
  bound, never disarm -> exit code 3 and the tunnel diagnostic."""
  code = textwrap.dedent(f"""
      import os, sys, time
      os.environ["ST_ENTRY_WATCHDOG_S"] = "1"
      os.environ["JAX_PLATFORMS"] = "axon,cpu"
      import jax
      # the watchdog reads config/env only; no device op is issued
      sys.path.insert(0, {_ROOT!r})
      import __graft_entry__
      __graft_entry__._arm_axon_init_watchdog()
      time.sleep(10)  # "wedged": never reaches disarm
      print("should not get here")
  """)
  env = dict(os.environ)
  env.pop("JAX_PLATFORMS", None)
  proc = subprocess.run([sys.executable, "-c", code], env=env,
                        capture_output=True, text=True, timeout=60)
  assert proc.returncode == 3, (proc.returncode, proc.stdout, proc.stderr)
  assert "wedged" in proc.stdout
  assert "should not get here" not in proc.stdout


def test_disarm_prevents_exit():
  """Disarming after the init phase must let the process run past the
  bound (the driver's compile continues in the same process)."""
  code = textwrap.dedent(f"""
      import os, sys, time
      os.environ["ST_ENTRY_WATCHDOG_S"] = "1"
      os.environ["JAX_PLATFORMS"] = "axon,cpu"
      import jax
      sys.path.insert(0, {_ROOT!r})
      import __graft_entry__
      disarm = __graft_entry__._arm_axon_init_watchdog()
      disarm()
      time.sleep(1.5)
      print("survived past the bound")
  """)
  env = dict(os.environ)
  env.pop("JAX_PLATFORMS", None)
  proc = subprocess.run([sys.executable, "-c", code], env=env,
                        capture_output=True, text=True, timeout=60)
  assert proc.returncode == 0, (proc.returncode, proc.stdout, proc.stderr)
  assert "survived past the bound" in proc.stdout
