"""On-device dopri5 integrator vs closed forms and scipy."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import integrate

from soft_truncation_tpu.sample.ode import odeint_dopri5, odeint_rk4_fixed


def test_exponential_decay():
  func = lambda t, y: -y
  y0 = jnp.ones((8,))
  res = odeint_dopri5(func, y0, 0.0, 3.0, rtol=1e-6, atol=1e-8)
  np.testing.assert_allclose(res.y, np.exp(-3.0) * np.ones(8), rtol=1e-4)
  assert int(res.status) == 0
  assert int(res.nfe) > 6


def test_harmonic_oscillator_backward():
  # y = [cos, sin]; dy/dt = [-sin, cos]; integrate BACKWARD from t=2pi to 0
  def func(t, y):
    return jnp.stack([-y[1], y[0]])

  y_end = jnp.array([np.cos(2 * np.pi), np.sin(2 * np.pi)])
  res = odeint_dopri5(func, y_end, 2 * np.pi, 0.0, rtol=1e-7, atol=1e-9)
  np.testing.assert_allclose(res.y, [1.0, 0.0], atol=1e-4)


def test_matches_scipy_rk45():
  def func_np(t, y):
    return np.sin(t) * y - 0.1 * y ** 2

  def func_jax(t, y):
    return jnp.sin(t) * y - 0.1 * y ** 2

  y0 = np.array([0.7, 1.3, 2.0], dtype=np.float32)
  sol = integrate.solve_ivp(func_np, (0.0, 4.0), y0, rtol=1e-5, atol=1e-5,
                            method="RK45")
  res = odeint_dopri5(func_jax, jnp.asarray(y0), 0.0, 4.0,
                      rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(res.y, sol.y[:, -1], rtol=2e-3, atol=1e-4)


def test_rk4_fixed():
  func = lambda t, y: -y
  res = odeint_rk4_fixed(func, jnp.ones(4), 0.0, 2.0, num_steps=100)
  np.testing.assert_allclose(res.y, np.exp(-2.0) * np.ones(4), rtol=1e-6)
  assert int(res.nfe) == 400


def test_jit_compatible():
  @jax.jit
  def run(y0):
    return odeint_dopri5(lambda t, y: -0.5 * y, y0, 0.0, 1.0).y

  np.testing.assert_allclose(run(jnp.ones(3)), np.exp(-0.5) * np.ones(3),
                             rtol=1e-4)
