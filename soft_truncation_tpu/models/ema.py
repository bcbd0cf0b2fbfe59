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
  (reference models/ema.py:43-51)."""
  d = jnp.minimum(decay, (1.0 + num_updates) / (10.0 + num_updates))
  return jax.tree.map(lambda e, p: e - (1.0 - d) * (e - p),
                      ema_params, new_params)
