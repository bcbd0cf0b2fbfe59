"""Unit tests for the small runtime utilities: the persistent XLA
compilation-cache setup (utils/compile_cache.py) and the observability
helpers (utils/profiling.py).

These are glue with gateable logic (argv/env cache disabling, no-op
trace paths) that the CLI and every bench tool rely on; a silent
regression here corrupts compile_s interpretation in the benchmark
records.
"""

import os
import sys
import time

import jax
import pytest

from soft_truncation_tpu.utils import compile_cache as cc
from soft_truncation_tpu.utils import profiling


@pytest.fixture
def restore_cache_config():
  """Snapshot and restore the jax compilation-cache config values."""
  before_dir = jax.config.jax_compilation_cache_dir
  before_min = jax.config.jax_persistent_cache_min_compile_time_secs
  yield
  jax.config.update("jax_compilation_cache_dir", before_dir)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", before_min)


def test_setup_compilation_cache_empty_is_noop(restore_cache_config):
  before = jax.config.jax_compilation_cache_dir
  cc.setup_compilation_cache("")
  assert jax.config.jax_compilation_cache_dir == before


def test_setup_compilation_cache_sets_dir(tmp_path, restore_cache_config):
  target = tmp_path / "xla_cache"
  cc.setup_compilation_cache(str(target))
  assert jax.config.jax_compilation_cache_dir == str(target)
  assert os.path.isdir(target)
  assert jax.config.jax_persistent_cache_min_compile_time_secs == 10.0


def test_from_argv_flag_disables(monkeypatch, restore_cache_config):
  monkeypatch.setattr(sys, "argv", ["tool.py", "--no-compile-cache"])
  monkeypatch.delenv("ST_TPU_NO_COMPILE_CACHE", raising=False)
  before = jax.config.jax_compilation_cache_dir
  assert cc.setup_compilation_cache_from_argv() is False
  assert jax.config.jax_compilation_cache_dir == before


def test_from_argv_env_disables(monkeypatch, restore_cache_config):
  monkeypatch.setattr(sys, "argv", ["tool.py"])
  monkeypatch.setenv("ST_TPU_NO_COMPILE_CACHE", "1")
  before = jax.config.jax_compilation_cache_dir
  assert cc.setup_compilation_cache_from_argv() is False
  assert jax.config.jax_compilation_cache_dir == before


def test_from_argv_default_enables(monkeypatch, tmp_path,
                                   restore_cache_config):
  monkeypatch.setattr(sys, "argv", ["tool.py", "batch=64"])
  monkeypatch.delenv("ST_TPU_NO_COMPILE_CACHE", raising=False)
  # Point the default dir somewhere writable and disposable.
  monkeypatch.setattr(cc, "DEFAULT_DIR", str(tmp_path / "cache"))
  assert cc.setup_compilation_cache_from_argv() is True
  assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")


def test_step_timer_rates():
  t = profiling.StepTimer(batch_size=32)
  for _ in range(5):
    t.tick()
  time.sleep(0.05)
  sps, ips = t.report()
  assert 0 < sps <= 5 / 0.05
  assert ips == pytest.approx(sps * 32)
  # Counter resets after report.
  sps2, _ = t.report()
  assert sps2 == 0.0


def test_trace_none_is_noop():
  with profiling.trace(None):
    pass  # must not start the profiler


def test_trace_writes_files(tmp_path):
  with profiling.trace(str(tmp_path)):
    jax.block_until_ready(jax.numpy.ones((8, 8)) * 2)
  # jax.profiler writes a plugins/profile/<ts>/ tree.
  found = [p for p, _, files in os.walk(tmp_path) for f in files]
  assert found, "profiler trace produced no files"


def test_annotate_usable():
  with profiling.annotate("unit-test-region"):
    pass
