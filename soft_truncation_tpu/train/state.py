"""Training state: one pytree carrying params, optimizer state, EMA, step.

Replaces the reference's mutable dict {optimizer, model, ema, step}
(utils.py:49-73) with an immutable flax.struct dataclass that jit
threads through the train step.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
  step: jax.Array          # int32 scalar
  params: Any
  opt_state: Any
  ema_params: Any
  ema_rate: float = flax.struct.field(pytree_node=False, default=0.9999)


def init_train_state(key, config, model, tx: optax.GradientTransformation,
                     input_shape=None, abstract: bool = False) -> TrainState:
  """Initialize params (and EMA copy) for ``model`` under ``config``.

  ``abstract=True`` returns a ShapeDtypeStruct pytree via jax.eval_shape —
  no device work at all. Useful as a checkpoint-restore template when the
  real values will come from the checkpoint anyway: on the tunneled TPU
  runtime the concrete init costs ~30-60 s of eval-mode startup."""
  if input_shape is None:
    input_shape = (1, config.data.image_size, config.data.image_size,
                   config.data.num_channels)
  # HBM byte diet: the EMA shadow may live in bf16 (config.tpu.ema_dtype);
  # update math stays f32 (models/ema.py).
  ema_dtype = jnp.dtype(
      config.tpu.get("ema_dtype", "float32") if "tpu" in config
      else "float32")
  if abstract:
    x_s = jax.ShapeDtypeStruct(input_shape, jnp.float32)
    t_s = jax.ShapeDtypeStruct((input_shape[0],), jnp.float32)
    variables = jax.eval_shape(
        lambda xx, tt: model.init({"params": key}, xx, tt, train=False),
        x_s, t_s)
    params = variables["params"]
    return TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32),
        params=params,
        opt_state=jax.eval_shape(tx.init, params),
        ema_params=jax.tree.map(
            lambda p: jax.ShapeDtypeStruct(p.shape, ema_dtype), params),
        ema_rate=float(config.model.ema_rate),
    )
  x = jnp.zeros(input_shape, dtype=jnp.float32)
  if config.model.embedding_type == "fourier":
    t = jnp.ones((input_shape[0],), dtype=jnp.float32)
  else:
    t = jnp.zeros((input_shape[0],), dtype=jnp.float32)
  variables = model.init({"params": key}, x, t, train=False)
  params = variables["params"]
  return TrainState(
      step=jnp.zeros((), jnp.int32),
      params=params,
      opt_state=tx.init(params),
      # NOTE: must COPY, not alias — same-dtype astype returns the same
      # buffer, and aliased params/ema_params break donate_argnums on TPU
      # (INVALID_ARGUMENT at dispatch)
      ema_params=jax.tree.map(
          lambda p: jnp.array(p, dtype=ema_dtype, copy=True), params),
      ema_rate=float(config.model.ema_rate),
  )


def param_count(params) -> int:
  return sum(p.size for p in jax.tree.leaves(params))
