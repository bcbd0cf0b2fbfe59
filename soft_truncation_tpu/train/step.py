"""The jitted training step: ST t_min sampling, micro-batch gradient
accumulation, optimizer, EMA — one XLA program.

Parity target: reference losses.py:218-325 (get_step_fn / step_fn /
step_fn_mixed). Differences by design:

  * The whole step (including Soft-Truncation's per-step t_min draw —
    host ``np.random.rand`` in the reference, losses.py:284) runs on
    device from an explicit key; zero host sync per step.
  * Micro-batches run under ``lax.scan`` (reference: Python loop with
    ``retain_graph=True`` backward per micro-batch, losses.py:285-288).
    Gradients are SUMMED across micro-batches exactly like accumulated
    ``backward()`` calls of per-micro means.
  * Data parallelism: the caller jits this function with the batch sharded
    over the mesh's ``data`` axis; XLA inserts the gradient all-reduce
    (replacing torch DataParallel scatter/gather, models/utils.py:94).
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses.losses import (get_ddpm_loss_fn, get_sde_loss_fn,
                             get_smld_loss_fn)
from ..models.ema import ema_update
from ..sde.core import SDE, VESDE, VPSDE, st_active_for
from .state import TrainState

Array = jax.Array


def make_train_step(config, sde: SDE, model,
                    tx: optax.GradientTransformation) -> Callable:
  """Returns train_step(state, batch, key) -> (new_state, per_example_losses).

  ``batch`` is the global batch [B, H, W, C] (shard it over the data axis
  when jitting); per-example losses come back for the reference's
  mean/std logging (run_lib.py:78-79).
  """
  continuous = config.training.continuous
  num_micro = config.optim.num_micro_batch
  mixed = config.training.get("mixed", False)
  st = st_active_for(sde, config)
  k_exp = config.training.get("k", 1.0)
  trunc = config.training.truncation_time
  importance_sampling = config.training.importance_sampling
  ddpm_weight = config.training.get("ddpm_weight", 0.01)
  balanced = config.training.get("balanced", False)

  if continuous:
    loss_fn = get_sde_loss_fn(config, sde, train=True)
  else:
    assert not config.training.likelihood_weighting, (
        "Likelihood weighting is not supported for original SMLD/DDPM "
        "training.")
    if isinstance(sde, VESDE):
      discrete_loss = get_smld_loss_fn(config, sde, train=True)
    elif isinstance(sde, VPSDE):
      discrete_loss = get_ddpm_loss_fn(config, sde, train=True)
    else:
      raise ValueError(
          f"Discrete training for {type(sde).__name__} is not recommended.")

  def micro_losses(params, mb, key, t_min, dropout_key) -> Array:
    """Per-example losses for one micro-batch."""
    rngs = {"dropout": dropout_key}
    if not continuous:
      return discrete_loss(params, model, mb, key, rngs=rngs)
    if mixed:
      half = mb.shape[0] // 2
      k_is, k_dd = jax.random.split(key)
      l_is = loss_fn(params, model, mb[:half], k_is, t_min, True, rngs=rngs)
      l_dd = loss_fn(params, model, mb[half:], k_dd, t_min, False, rngs=rngs)
      if balanced:
        scale = jax.lax.stop_gradient(jnp.mean(l_is / l_dd))
        return l_is + ddpm_weight * scale * l_dd
      return l_is + ddpm_weight * l_dd
    return loss_fn(params, model, mb, key, t_min, importance_sampling,
                   rngs=rngs)

  def micro_objective(params, mb, key, t_min, dropout_key):
    losses = micro_losses(params, mb, key, t_min, dropout_key)
    return jnp.mean(losses), losses

  grad_fn = jax.value_and_grad(micro_objective, has_aux=True)

  def train_step(state: TrainState, batch: Array,
                 key: Array) -> Tuple[TrainState, Array]:
    k_tmin, k_loss, k_drop = jax.random.split(key, 3)
    if st:
      t_min = sde.sample_t_min(k_tmin, k_exp, trunc)
    else:
      t_min = jnp.asarray(trunc)

    b = batch.shape[0]
    assert b % num_micro == 0, (b, num_micro)

    if num_micro == 1:
      (_, losses), grads = grad_fn(state.params, batch, k_loss, t_min,
                                   k_drop)
    else:
      micro_b = b // num_micro
      batches = batch.reshape((num_micro, micro_b) + batch.shape[1:])
      keys = jax.random.split(k_loss, num_micro)
      dkeys = jax.random.split(k_drop, num_micro)

      def body(g_acc, xs):
        mb, mk, dk = xs
        (_, losses_k), g = grad_fn(state.params, mb, mk, t_min, dk)
        g_acc = jax.tree.map(jnp.add, g_acc, g)
        return g_acc, losses_k

      zeros = jax.tree.map(jnp.zeros_like, state.params)
      grads, losses = jax.lax.scan(body, zeros, (batches, keys, dkeys))
      losses = losses.reshape(-1)

    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_step = state.step + 1
    ema_params = ema_update(state.ema_params, params, state.ema_rate,
                            new_step)
    new_state = state.replace(step=new_step, params=params,
                              opt_state=opt_state, ema_params=ema_params)
    return new_state, losses

  return train_step


def make_multi_train_step(config, sde: SDE, model,
                          tx: optax.GradientTransformation,
                          preprocess: Callable = None) -> Callable:
  """K train steps in ONE XLA program (``lax.scan`` over a [K, B, ...]
  batch stack). One host dispatch per K steps — for runtimes where
  per-dispatch overhead is not hidden by async pipelining. On the
  tunneled v5e K=1 measured FASTER (1,883 vs 1,825 imgs/s end to end;
  benchmarks/ROOFLINE.md "End-to-end CLI training"), so this is an
  escape hatch, not the default. The per-step math is exactly
  ``make_train_step``'s, fed the same per-step keys.

  ``preprocess(batch, key) -> batch`` (optional) runs inside the program
  before each step — run_lib folds dequantization+scaling in so a window
  is truly one dispatch.

  The per-step keys are split from ``key`` inside the program with the
  same ``key, k_pre, k_step = split(key, 3)`` chain the eager loop used,
  so a K-window draws bit-identical randomness to K single steps (the
  result can differ from K separate dispatches only by XLA
  fusion/reassociation rounding); the advanced key is returned for the
  next window and never leaves the device between dispatches.

  Returns multi_step(state, batches [K,B,...], key)
       -> (state, key', losses [K, B_losses]).
  """
  train_step = make_train_step(config, sde, model, tx)

  def multi_step(state: TrainState, batches: Array,
                 key: Array) -> Tuple[TrainState, Array, Array]:
    def body(carry, b):
      st, k = carry
      k, k_pre, k_step = jax.random.split(k, 3)
      if preprocess is not None:
        b = preprocess(b, k_pre)
      st, losses = train_step(st, b, k_step)
      return (st, k), losses

    if batches.shape[0] == 1:
      # width-1 window (the default): straight-line program, no scan.
      # A scan carrying the full 62M-param state measured ~4-5 ms/step
      # of extra HBM traffic (carry buffer copies) on a v5e — the
      # single-step program avoids it while keeping the window calling
      # convention (and the identical key chain).
      (state, key), losses = body((state, key), batches[0])
      return state, key, losses[None]

    (state, key), losses = jax.lax.scan(body, (state, key), batches)
    return state, key, losses

  return multi_step


def make_eval_loss_step(config, sde: SDE, model) -> Callable:
  """Per-example eval losses with EMA-or-raw params; the reference's
  eval-mode step_fn path is dead code (losses.py:279-293 would hit an
  unbound variable) — this is the working equivalent."""
  loss_fn = get_sde_loss_fn(config, sde, train=False)
  importance_sampling = config.training.importance_sampling
  trunc = config.training.truncation_time

  def eval_step(params, batch, key):
    return loss_fn(params, model, batch, key, jnp.asarray(trunc),
                   importance_sampling, rngs=None)

  return eval_step
