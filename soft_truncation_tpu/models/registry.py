"""Model registry (reference models/utils.py:25-48) + construction."""

from __future__ import annotations

from typing import Dict, Type

_MODELS: Dict[str, type] = {}


def register_model(cls=None, *, name: str | None = None):
  """Class decorator registering a score network under ``name``."""

  def _register(c):
    local_name = name or c.__name__
    if local_name in _MODELS:
      raise ValueError(f"already registered model with name: {local_name}")
    _MODELS[local_name] = c
    return c

  return _register if cls is None else _register(cls)


def get_model(name: str) -> type:
  return _MODELS[name]


def create_model(config):
  """Instantiate the Flax module named by config.model.name.

  Unlike the reference (models/utils.py:89-95) there is no device move or
  DataParallel wrap — replication/sharding is decided by the train step's
  `jax.jit` shardings (see soft_truncation_tpu.parallel).
  """
  cls = get_model(config.model.name)
  return cls.from_config(config)
