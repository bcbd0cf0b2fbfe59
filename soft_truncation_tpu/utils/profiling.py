"""Tracing/profiling hooks (SURVEY.md section 5: the reference has none;
this is the TPU-native observability layer).

  * ``trace(dir)``: context manager around jax.profiler for device traces
    viewable in TensorBoard/Perfetto.
  * ``StepTimer``: cheap rolling step timing with imgs/sec; logs on the
    training loop's log_freq cadence without forcing device syncs.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

import jax

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(trace_dir: Optional[str]):
  """Capture a jax.profiler trace into ``trace_dir`` (no-op if None)."""
  if not trace_dir:
    yield
    return
  jax.profiler.start_trace(trace_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()
    log.info("profiler trace written to %s", trace_dir)


class StepTimer:
  """Rolling wall-clock step timing. ``tick()`` per step; ``report()``
  returns (steps_per_sec, imgs_per_sec) since the last report."""

  def __init__(self, batch_size: int):
    self.batch_size = batch_size
    self._t0 = time.perf_counter()
    self._steps = 0

  def tick(self) -> None:
    self._steps += 1

  def report(self) -> tuple[float, float]:
    now = time.perf_counter()
    dt = max(now - self._t0, 1e-9)
    sps = self._steps / dt
    self._t0 = now
    self._steps = 0
    return sps, sps * self.batch_size


def annotate(name: str):
  """Named profiler region (shows up in traces)."""
  return jax.profiler.TraceAnnotation(name)
