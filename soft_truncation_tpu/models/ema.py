"""Exponential moving average over a params pytree.

Parity: reference models/ema.py:10-98 (shadow params, warmup decay
min(decay, (1+n)/(10+n))). In JAX the EMA is just a second pytree inside
TrainState — update is one fused tree_map inside the jitted train step; the
reference's store/copy_to/restore dance is replaced by selecting which
pytree to pass to eval functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, new_params, decay: float, num_updates):
  """One EMA step with warmup. ``num_updates`` is the post-increment count
  (reference models/ema.py:43-51).

  The shadow may be stored in a reduced dtype (config.tpu.ema_dtype,
  HBM byte diet); the update math always runs in f32 and the result is
  cast back to the storage dtype."""
  d = jnp.minimum(decay, (1.0 + num_updates) / (10.0 + num_updates))

  def upd(e, p):
    e32 = e.astype(jnp.float32)
    return (e32 - (1.0 - d) * (e32 - p.astype(jnp.float32))).astype(e.dtype)

  return jax.tree.map(upd, ema_params, new_params)
