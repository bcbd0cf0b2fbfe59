"""Device mesh + sharding policy.

The reference's entire parallelism story is single-process
``torch.nn.DataParallel`` (models/utils.py:94): replicate the module per
GPU, scatter the batch, gather outputs. The TPU-native equivalent is one
GSPMD program: a ``Mesh`` with a ``data`` axis, batch arrays sharded on it,
state replicated, and XLA inserting the gradient all-reduce over ICI.

Multi-host pods need no extra code here — ``jax.devices()`` spans the
slice, each host feeds its addressable shard of the batch
(data/pipeline feeds per-host), and the same jitted step runs SPMD.

The mesh shape is configurable (``config.tpu.mesh_shape``) so future
model-parallel axes can be added; parity with the reference needs only
the 1-D data axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(mesh_shape: Sequence[int] = (),
              devices: Optional[Sequence] = None) -> Mesh:
  """Build the device mesh.

  Default: every device on one 'data' axis. A 2-D mesh ``(d, s)`` adds a
  'space' axis for spatial sharding of high-resolution activations
  (convs get GSPMD halo exchanges automatically) — the image-model
  analogue of sequence parallelism (SURVEY.md section 2.3).
  """
  devices = list(devices if devices is not None else jax.devices())
  if not mesh_shape:
    mesh_shape = (len(devices),)
  assert int(np.prod(mesh_shape)) == len(devices), (
      f"mesh {mesh_shape} != {len(devices)} devices")
  arr = np.asarray(devices).reshape(mesh_shape)
  axis_names = (DATA_AXIS, SPACE_AXIS)[:len(mesh_shape)]
  if len(mesh_shape) > 2:
    axis_names = axis_names + tuple(
        f"model{i}" for i in range(2, len(mesh_shape)))
  return Mesh(arr, tuple(axis_names))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
  """Shard the leading (batch) dim over 'data'; with ``spatial`` (2-D mesh)
  also shard image height over 'space'."""
  if spatial and SPACE_AXIS in mesh.axis_names:
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
  return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch, spatial: bool = False):
  """Place a host array as a batch-sharded device array."""
  return jax.device_put(batch, batch_sharding(mesh, spatial=spatial))


def stacked_batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
  """Sharding for a [K, B, H, W, C] stack of K per-step batches
  (steps_per_dispatch windows): batch dim (axis 1) over 'data', K
  replicated — each device holds its batch shard for every step of the
  window."""
  if spatial and SPACE_AXIS in mesh.axis_names:
    return NamedSharding(mesh, P(None, DATA_AXIS, SPACE_AXIS))
  return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_stacked_batch(mesh: Mesh, batches, spatial: bool = False):
  """Place a host [K, B, ...] batch stack as a device array sharded on
  the batch dim."""
  return jax.device_put(batches, stacked_batch_sharding(mesh, spatial=spatial))
