"""Persistent XLA compilation cache setup (shared by the CLI and the
bench/profiling tools).

High-res and long-scan sampler programs compile for minutes (3-25 min at
256^2+ over the tunneled runtime); with a persistent cache the second
run of the same program loads in seconds (measured 127s -> 27s warm
start for the flagship train step)."""

from __future__ import annotations

import os

DEFAULT_DIR = "~/.cache/soft_truncation_tpu_xla"


def setup_compilation_cache(cache_dir: str | None = None) -> None:
  """Enable the persistent cache; None → DEFAULT_DIR (resolved at call
  time so it can be overridden), '' disables (no-op)."""
  if cache_dir is None:
    cache_dir = DEFAULT_DIR
  if not cache_dir:
    return
  import jax
  cache_dir = os.path.expanduser(cache_dir)
  os.makedirs(cache_dir, exist_ok=True)
  jax.config.update("jax_compilation_cache_dir", cache_dir)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def setup_compilation_cache_from_argv() -> bool:
  """Bench/profiling-tool entry: enable the cache unless disabled via
  ``--no-compile-cache`` in sys.argv or ``ST_TPU_NO_COMPILE_CACHE=1``.

  Cold-compile measurements need the persistent cache OFF so compile_s is
  interpretable (a warm-cache repeat is seconds, cold is minutes for the
  big sampler scans). Returns whether the cache is on, for tagging
  records with their cache state."""
  import sys
  enabled = ("--no-compile-cache" not in sys.argv
             and os.environ.get("ST_TPU_NO_COMPILE_CACHE", "") != "1")
  if enabled:
    setup_compilation_cache()
  return enabled
