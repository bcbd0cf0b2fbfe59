"""Adaptive Dormand-Prince 5(4) ODE integrator, fully on device.

Replaces the reference's scipy.integrate.solve_ivp RK45 loop
(likelihood.py:111, sampling.py:492-493), which round-trips
flatten->numpy->torch->device on EVERY function evaluation. Here the whole
adaptive loop is a ``lax.while_loop`` inside jit: same Butcher tableau and
PI step-size control family as scipy's RK45, zero host syncs.

The state ``y`` is one flat f32 array; callers pack/unpack (x, logp).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Dormand-Prince RK45 tableau (identical to scipy.integrate.RK45).
# Host numpy on purpose: jnp here would be a DEVICE op at import time,
# eagerly initializing the backend before any caller can pin a platform
# (and wedging imports outright when the TPU tunnel is unhealthy — see
# CLAUDE.md). As trace-time literals the constants compile identically.
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0], np.float32)
_A = [
    np.array([], np.float32),
    np.array([1 / 5], np.float32),
    np.array([3 / 40, 9 / 40], np.float32),
    np.array([44 / 45, -56 / 15, 32 / 9], np.float32),
    np.array([19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
             np.float32),
    np.array([9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176,
              -5103 / 18656], np.float32),
    np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784,
              11 / 84], np.float32),
]
_B = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784,
               11 / 84, 0.0], np.float32)
# 4th-order embedded solution error weights (b - b_hat)
_E = np.array([71 / 57600, 0.0, -71 / 16695, 71 / 1920, -17253 / 339200,
               22 / 525, -1 / 40], np.float32)

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0
_ORDER_EXP = -1.0 / 5.0


class ODEResult(NamedTuple):
  y: Array
  nfe: Array
  status: Array  # 0 ok, 1 hit max_steps


def _initial_step(func, t0, y0, f0, direction, rtol, atol):
  """scipy's automatic initial step size heuristic (order 5)."""
  scale = atol + jnp.abs(y0) * rtol
  d0 = jnp.sqrt(jnp.mean((y0 / scale) ** 2))
  d1 = jnp.sqrt(jnp.mean((f0 / scale) ** 2))
  h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
  y1 = y0 + h0 * direction * f0
  f1 = func(t0 + h0 * direction, y1)
  d2 = jnp.sqrt(jnp.mean(((f1 - f0) / scale) ** 2)) / h0
  h1 = jnp.where((d1 <= 1e-15) & (d2 <= 1e-15),
                 jnp.maximum(1e-6, h0 * 1e-3),
                 (0.01 / jnp.maximum(d1, d2)) ** (1.0 / 5.0))
  return jnp.minimum(100 * h0, h1)


def odeint_dopri5(func: Callable[[Array, Array], Array], y0: Array,
                  t0: float, t1: float, rtol: float = 1e-5,
                  atol: float = 1e-5, max_steps: int = 10000) -> ODEResult:
  """Integrate dy/dt = func(t, y) from t0 to t1 (either direction)."""
  direction = jnp.sign(jnp.asarray(t1 - t0, jnp.float32))
  t0 = jnp.asarray(t0, jnp.float32)
  t1 = jnp.asarray(t1, jnp.float32)

  f0 = func(t0, y0)
  h0 = _initial_step(func, t0, y0, f0, direction, rtol, atol)
  h0 = jnp.minimum(h0, jnp.abs(t1 - t0))

  def step_once(t, y, f, h):
    """One RK45 step attempt; returns (y_new, f_new, error_norm)."""
    ks = [f]
    for i in range(1, 7):
      dy = h * direction * jnp.tensordot(_A[i], jnp.stack(ks), axes=1)
      ti = t + _C[i] * h * direction
      ks.append(func(ti, y + dy))
    k = jnp.stack(ks)
    y_new = y + h * direction * jnp.tensordot(_B, k, axes=1)
    f_new = ks[-1]  # FSAL: k7 evaluated at (t+h, y_new)
    err = h * direction * jnp.tensordot(_E, k, axes=1)
    scale = atol + jnp.maximum(jnp.abs(y), jnp.abs(y_new)) * rtol
    err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2))
    return y_new, f_new, err_norm

  def cond(state):
    t, y, f, h, nfe, steps, done = state
    return jnp.logical_and(jnp.logical_not(done), steps < max_steps)

  def body(state):
    t, y, f, h, nfe, steps, done = state
    remaining = jnp.abs(t1 - t)
    h_eff = jnp.minimum(h, remaining)
    y_new, f_new, err_norm = step_once(t, y, f, h_eff)
    accept = err_norm <= 1.0
    factor = jnp.where(
        err_norm == 0.0, _MAX_FACTOR,
        jnp.clip(_SAFETY * err_norm ** _ORDER_EXP, _MIN_FACTOR, _MAX_FACTOR))
    h_next = h_eff * factor
    t_next = jnp.where(accept, t + h_eff * direction, t)
    y_next = jax.tree.map(lambda a, b: jnp.where(accept, a, b), y_new, y)
    f_next = jnp.where(accept, f_new, f)
    finished = jnp.abs(t_next - t0) >= jnp.abs(t1 - t0) - 1e-12
    return (t_next, y_next, f_next, h_next, nfe + 6, steps + 1,
            finished)

  init = (t0, y0, f0, h0, jnp.asarray(2, jnp.int32),
          jnp.asarray(0, jnp.int32), jnp.asarray(False))
  t, y, f, h, nfe, steps, done = jax.lax.while_loop(cond, body, init)
  status = jnp.where(done, 0, 1).astype(jnp.int32)
  return ODEResult(y=y, nfe=nfe, status=status)


def odeint_rk4_fixed(func: Callable[[Array, Array], Array], y0: Array,
                     t0: float, t1: float, num_steps: int) -> ODEResult:
  """Fixed-grid classic RK4 via lax.scan: deterministic cost, no control
  flow divergence — the fastest option on TPU when tolerance allows."""
  ts = jnp.linspace(t0, t1, num_steps + 1)

  def body(y, i):
    t_a = ts[i]
    h = ts[i + 1] - ts[i]
    k1 = func(t_a, y)
    k2 = func(t_a + h / 2, y + h / 2 * k1)
    k3 = func(t_a + h / 2, y + h / 2 * k2)
    k4 = func(t_a + h, y + h * k3)
    return y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4), None

  y, _ = jax.lax.scan(body, y0, jnp.arange(num_steps))
  return ODEResult(y=y, nfe=jnp.asarray(4 * num_steps, jnp.int32),
                   status=jnp.asarray(0, jnp.int32))
