"""Two-tier Orbax checkpointing.

Mirrors the reference layout (utils.py:49-73, run_lib.py:82-89):
  workdir/checkpoints-meta/   rolling preemption checkpoint, auto-restored
  workdir/checkpoints/        numbered snapshots checkpoint_<n>

Degrades gracefully when nothing exists yet (utils.py:14-18).
"""

from __future__ import annotations

import logging
import os
import shutil
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState

log = logging.getLogger(__name__)


def _is_primary() -> bool:
  return jax.process_index() == 0


def _sync(name: str) -> None:
  """Cross-process barrier (no-op single-process).

  Orbax coordinates the array WRITES itself, but the surrounding
  directory lifecycle here (rmtree the previous tmp, atomic rename into
  place) is ours — under jax.distributed only the primary process may
  mutate the shared filesystem, and every other process must not race
  past it (tests/test_multihost.py save->restore->resume)."""
  if jax.process_count() > 1:
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def _host_template(template: TrainState) -> TrainState:
  """Numpy copy of the state pytree, so Orbax restores to HOST memory.

  Restoring straight to device arrays is the Orbax default when the
  template holds jax arrays, but on the tunneled TPU runtime (axon) the
  first device->host read AFTER a direct-to-device restore measured ~14
  minutes for one scalar. Restoring to host numpy and letting callers
  jax.device_put (run_lib.train already does; eval uploads once) is
  robust on every runtime and makes host-side field access (state.step)
  free. Built from shapes/dtypes only — converting the template with
  np.asarray would itself drag ~1 GB device->host through the tunnel
  (observed stalling >10 min)."""
  import jax.numpy as jnp
  return jax.tree.map(
      lambda x: np.zeros(jnp.shape(x), jnp.result_type(x)), template)


class CheckpointManager:

  def __init__(self, workdir: str):
    self.workdir = os.path.abspath(workdir)
    self.ckpt_dir = os.path.join(self.workdir, "checkpoints")
    self.meta_dir = os.path.join(self.workdir, "checkpoints-meta")
    os.makedirs(self.ckpt_dir, exist_ok=True)
    os.makedirs(self.meta_dir, exist_ok=True)
    self._ckptr = ocp.StandardCheckpointer()

  # -- rolling preemption checkpoint --------------------------------------
  @property
  def meta_path(self) -> str:
    return os.path.join(self.meta_dir, "checkpoint")

  def save_meta(self, state: TrainState) -> None:
    tmp = self.meta_path + ".tmp"
    if _is_primary() and os.path.exists(tmp):
      shutil.rmtree(tmp)
    _sync("save_meta_pre")
    self._ckptr.save(tmp, state)
    self._ckptr.wait_until_finished()
    _sync("save_meta_written")
    if _is_primary():
      if os.path.exists(self.meta_path):
        shutil.rmtree(self.meta_path)
      os.rename(tmp, self.meta_path)
    _sync("save_meta_renamed")

  def restore_meta(self, template: TrainState) -> Optional[TrainState]:
    """Restore the rolling checkpoint if present; else None."""
    if not os.path.exists(self.meta_path):
      log.warning("No checkpoint found at %s. Starting fresh.",
                  self.meta_path)
      return None
    restored = self._ckptr.restore(self.meta_path, _host_template(template))
    log.info("%s loaded ...", self.meta_path)
    return restored

  # -- numbered snapshots ---------------------------------------------------
  def snapshot_path(self, save_step: int) -> str:
    return os.path.join(self.ckpt_dir, f"checkpoint_{save_step}")

  def save_snapshot(self, state: TrainState, save_step: int) -> None:
    path = self.snapshot_path(save_step)
    if _is_primary() and os.path.exists(path):
      shutil.rmtree(path)
    _sync("save_snapshot_pre")
    self._ckptr.save(path, state)
    self._ckptr.wait_until_finished()
    _sync("save_snapshot_written")

  def restore_snapshot(self, template: TrainState,
                       save_step: int) -> TrainState:
    return self._ckptr.restore(self.snapshot_path(save_step),
                               _host_template(template))

  def latest_snapshot_step(self) -> Optional[int]:
    steps = []
    for name in os.listdir(self.ckpt_dir):
      if name.startswith("checkpoint_"):
        try:
          steps.append(int(name.split("_")[1]))
        except ValueError:
          pass
    return max(steps) if steps else None
