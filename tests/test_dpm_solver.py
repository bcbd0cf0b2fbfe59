"""DPM-Solver++(2M) sampler tests on analytic-score Gaussian models.

For zero-mean Gaussian data x0 ~ N(0, s0^2 I) under an affine-marginal
SDE (x_t ~ N(c(t) x0, s(t)^2 I)), every marginal is N(0, V(t) I) with
V(t) = c(t)^2 s0^2 + s(t)^2, and the probability-flow ODE is linear, so
its exact solution scales each trajectory by sqrt(V(t)/V(T)) — a closed
form to test convergence and correctness against.
"""

import jax
import jax.numpy as jnp
import numpy as np

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.sample import get_dpm_solver_sampler, get_sampling_fn
from soft_truncation_tpu.sde import batch_mul, get_sde

from tests.test_sampling_likelihood import AnalyticVEModel

SHAPE = (8, 4, 4, 1)
S0 = 0.5
EPS = 1e-3


def ve_config():
  config = default_config("cifar10")
  override(config, {
      "training": dict(sde="vesde", continuous=True),
      "data": dict(image_size=4, num_channels=1, centered=True),
      "sampling": dict(method="dpm_solver", noise_removal=False),
  })
  return config


class AnalyticVPGaussModel:
  """VP-path net whose calibrated (ddpm_score) score is the true score
  of N(0, s0^2 I) data: score = -x / (c^2 s0^2 + s^2)."""

  def __init__(self, sde, s0):
    self.sde, self.s02 = sde, s0 ** 2

  def apply(self, variables, x, labels, train=False, rngs=None):
    t = labels / 999.0
    ones = jnp.ones_like(x)
    c = self.sde.marginal_prob(ones, t)[0]
    std = self.sde.marginal_std(t)
    var = c ** 2 * self.s02 + batch_mul(std, jnp.ones_like(t)).reshape(
        (-1,) + (1,) * (x.ndim - 1)) ** 2
    score = -x / var
    # ddpm_score wrapping divides by -std: model output = -score * std
    return -batch_mul(std, score.reshape(x.shape[0], -1)).reshape(x.shape)


def _exact_scale(sde, s0, t_hi, t_lo):
  ones = jnp.ones((1, 1, 1, 1))
  def V(t):
    mean, std = sde.marginal_prob(ones, jnp.full((1,), t))
    return float(mean.reshape(())) ** 2 * s0 ** 2 + float(std[0]) ** 2
  return np.sqrt(V(t_lo) / V(t_hi))


def _run(config, sde, model, steps):
  sampler = get_dpm_solver_sampler(config, sde, SHAPE, lambda x: x,
                                   steps=steps, denoise=False, eps=EPS)
  return sampler(model, {}, jax.random.PRNGKey(3))


def test_ve_matches_exact_linear_flow():
  config = ve_config()
  sde = get_sde(config)
  model = AnalyticVEModel(S0)
  x, nfe = _run(config, sde, model, steps=64)
  assert nfe == 64
  # exact flow scales the initial noise by sqrt(V(eps)/V(T))
  key = jax.random.PRNGKey(3)
  _, k_prior = jax.random.split(key)
  x_T = sde.prior_sampling(k_prior, SHAPE)
  want = np.asarray(x_T) * _exact_scale(sde, S0, sde.T, EPS)
  np.testing.assert_allclose(np.asarray(x), want, rtol=5e-3, atol=5e-3)


def test_vp_matches_exact_linear_flow():
  config = ve_config()
  override(config, {"training": dict(sde="vpsde", ddpm_score=True,
                                     unbounded_parametrization=False)})
  sde = get_sde(config)
  model = AnalyticVPGaussModel(sde, S0)
  x, _ = _run(config, sde, model, steps=64)
  key = jax.random.PRNGKey(3)
  _, k_prior = jax.random.split(key)
  x_T = sde.prior_sampling(k_prior, SHAPE)
  want = np.asarray(x_T) * _exact_scale(sde, S0, sde.T, EPS)
  np.testing.assert_allclose(np.asarray(x), want, rtol=5e-3, atol=5e-3)


class AnalyticSubVPGaussModel:
  """subVP-path net (labels t*999, raw score output, no ddpm_score):
  true score of N(0, s0^2 I) data is -x / (c^2 s0^2 + std^2)."""

  def __init__(self, sde, s0):
    self.sde, self.s02 = sde, s0 ** 2

  def apply(self, variables, x, labels, train=False, rngs=None):
    t = labels / 999.0
    c = self.sde.marginal_prob(jnp.ones_like(x), t)[0]
    std = self.sde.marginal_prob(jnp.zeros_like(x), t)[1]
    var = c ** 2 * self.s02 + batch_mul(
        std, jnp.ones((x.shape[0],))).reshape(
        (-1,) + (1,) * (x.ndim - 1)) ** 2
    return -x / var


def test_rve_matches_exact_linear_flow():
  """Reciprocal-VE (the UNCSN++ flagship SDE): affine marginal with
  sigma labels — the generic data-prediction form must hold."""
  config = ve_config()
  override(config, {"training": dict(sde="reciprocal_vesde", eta=1e-4)})
  sde = get_sde(config)
  model = AnalyticVEModel(S0)  # labels are sigma(t) for RVE too
  x, _ = _run(config, sde, model, steps=64)
  key = jax.random.PRNGKey(3)
  _, k_prior = jax.random.split(key)
  x_T = sde.prior_sampling(k_prior, SHAPE)
  want = np.asarray(x_T) * _exact_scale(sde, S0, sde.T, EPS)
  np.testing.assert_allclose(np.asarray(x), want, rtol=5e-3, atol=5e-3)


def test_subvp_matches_exact_linear_flow():
  config = ve_config()
  override(config, {"training": dict(sde="subvpsde", ddpm_score=False,
                                     unbounded_parametrization=False)})
  sde = get_sde(config)
  model = AnalyticSubVPGaussModel(sde, S0)
  x, _ = _run(config, sde, model, steps=64)
  key = jax.random.PRNGKey(3)
  _, k_prior = jax.random.split(key)
  x_T = sde.prior_sampling(k_prior, SHAPE)
  want = np.asarray(x_T) * _exact_scale(sde, S0, sde.T, EPS)
  np.testing.assert_allclose(np.asarray(x), want, rtol=5e-3, atol=5e-3)


def test_second_order_convergence():
  config = ve_config()
  sde = get_sde(config)
  model = AnalyticVEModel(S0)
  key = jax.random.PRNGKey(3)
  _, k_prior = jax.random.split(key)
  x_T = sde.prior_sampling(k_prior, SHAPE)
  want = np.asarray(x_T) * _exact_scale(sde, S0, sde.T, EPS)

  errs = []
  for steps in (16, 32, 64):
    x, _ = _run(config, sde, model, steps)
    errs.append(float(np.abs(np.asarray(x) - want).max()))
  # order 2: error drops ~4x per step doubling (allow slack)
  assert errs[0] / errs[1] > 2.5, errs
  assert errs[1] / errs[2] > 2.5, errs


def test_dispatch_and_denoise():
  config = ve_config()
  config.sampling.noise_removal = True
  config.sampling.dpm_steps = 16
  sde = get_sde(config)
  model = AnalyticVEModel(S0)
  sampler = get_sampling_fn(config, sde, SHAPE, lambda x: x, eps=EPS)
  x, nfe = sampler(model, {}, jax.random.PRNGKey(0))
  assert nfe == 17  # steps + final data-prediction denoise
  assert x.shape == SHAPE
  assert np.all(np.isfinite(np.asarray(x)))
