"""Sampler + likelihood integration tests on analytic-score toy models.

For unit-Gaussian data under the VP SDE, p_t = N(0, I) for every t, so the
true score is -x, the probability-flow drift is identically zero, and the
exact NLL is the standard-normal log-density — closed forms to test
against (SURVEY.md section 4, point 4).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.likelihood import (get_elbo_fn, get_likelihood_fn,
                                            get_likelihood_residual_fn)
from soft_truncation_tpu.sample import get_pc_sampler, get_sampling_fn
from soft_truncation_tpu.sde import VESDE, VPSDE, batch_mul, get_sde


class AnalyticVPModel:
  """Network whose calibrated score (ddpm_score) is exactly -x."""

  def __init__(self, sde):
    self.sde = sde

  def apply(self, variables, x, labels, train=False, rngs=None):
    t = labels / 999.0
    std = self.sde.marginal_std(t)
    return batch_mul(std, x)  # score = -out/std = -x


class AnalyticVEModel:
  """VE-path network returning the true score for N(0, s^2 I) data."""

  def __init__(self, data_std):
    self.s2 = data_std ** 2

  def apply(self, variables, x, labels, train=False, rngs=None):
    # continuous VE labels are sigma(t)
    var = self.s2 + labels ** 2
    return -batch_mul(1.0 / var, x)


def vp_config():
  config = default_config("cifar10")
  override(config, {
      "training": dict(sde="vpsde", continuous=True, ddpm_score=True,
                       unbounded_parametrization=False),
      "data": dict(image_size=4, num_channels=1, centered=True),
      "eval": dict(probability_flow=True, lambda_=0.0),
  })
  return config


def test_likelihood_exact_gaussian():
  config = vp_config()
  sde = get_sde(config)
  model = AnalyticVPModel(sde)
  inverse_scaler = lambda x: (x + 1.0) / 2.0

  likelihood_fn = get_likelihood_fn(config, sde, inverse_scaler,
                                    rtol=1e-5, atol=1e-5)
  data = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 1))
  bpd, z, nfe = likelihood_fn(model, {}, data, jax.random.PRNGKey(1),
                              mode="wrong")
  # analytic: drift == 0 => z == data, delta_logp == 0
  np.testing.assert_allclose(np.asarray(z), np.asarray(data), atol=1e-3)
  d = 16
  logp = (-d / 2 * math.log(2 * math.pi)
          - np.sum(np.asarray(data).reshape(4, -1) ** 2, -1) / 2)
  offset = 7.0 - inverse_scaler(-1.0)
  expect = -logp / d / math.log(2) + offset
  np.testing.assert_allclose(np.asarray(bpd), expect, rtol=1e-3)
  assert int(nfe) > 0


def test_likelihood_correct_mode_close_to_wrong():
  """With the exact score, 'correct' mode (perturb + residual) should give
  bpd close to 'wrong' mode in expectation."""
  config = vp_config()
  sde = get_sde(config)
  model = AnalyticVPModel(sde)
  inverse_scaler = lambda x: (x + 1.0) / 2.0
  likelihood_fn = get_likelihood_fn(config, sde, inverse_scaler)
  data = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 1))
  bpd_c, _, _ = likelihood_fn(model, {}, data, jax.random.PRNGKey(1),
                              mode="correct", eps=1e-5)
  bpd_w, _, _ = likelihood_fn(model, {}, data, jax.random.PRNGKey(1),
                              mode="wrong", eps=1e-5)
  assert np.isfinite(np.asarray(bpd_c)).all()
  # the residual term is small at eps=1e-5 for the exact score
  assert abs(float(jnp.mean(bpd_c)) - float(jnp.mean(bpd_w))) < 0.15


def test_likelihood_shared_primal_matches_two_pass():
  """shared_primal=True (one jax.jvp per RK stage, primal reused as the
  drift) computes the SAME estimator as the two-pass form (standalone
  drift + separate jvp) — same key, bpd must agree to f32 reassociation
  tolerance. The fast path exists because XLA does not CSE the duplicated
  network application (~2x forward vs ~3x; benchmarks/likelihood.jsonl)."""
  config = vp_config()
  sde = get_sde(config)
  model = AnalyticVPModel(sde)
  inverse_scaler = lambda x: (x + 1.0) / 2.0
  data = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 1))
  key = jax.random.PRNGKey(1)
  fast = get_likelihood_fn(config, sde, inverse_scaler, shared_primal=True)
  slow = get_likelihood_fn(config, sde, inverse_scaler, shared_primal=False)
  bpd_f, z_f, _ = fast(model, {}, data, key, mode="correct", eps=1e-4)
  bpd_s, z_s, _ = slow(model, {}, data, key, mode="correct", eps=1e-4)
  np.testing.assert_allclose(np.asarray(bpd_f), np.asarray(bpd_s),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_s),
                             rtol=1e-4, atol=1e-5)


def test_elbo_upper_bounds_nll():
  config = vp_config()
  sde = get_sde(config)
  model = AnalyticVPModel(sde)
  inverse_scaler = lambda x: (x + 1.0) / 2.0
  elbo_fn = get_elbo_fn(config, sde, inverse_scaler=inverse_scaler)
  data = jax.random.normal(jax.random.PRNGKey(0), (64, 4, 4, 1))
  nelbo, residual = elbo_fn(model, {}, data, jax.random.PRNGKey(1))
  assert nelbo.shape == (64,)
  assert np.isfinite(np.asarray(nelbo)).all()
  d = 16
  logp = (-d / 2 * math.log(2 * math.pi)
          - np.sum(np.asarray(data).reshape(64, -1) ** 2, -1) / 2)
  nll_bpd = -logp / d / math.log(2) + (7.0 - inverse_scaler(-1.0))
  # NELBO in bpd should be close to (and statistically above) the true NLL
  assert float(jnp.mean(nelbo)) > np.mean(nll_bpd) - 0.1
  assert float(jnp.mean(nelbo)) < np.mean(nll_bpd) + 1.0


def test_residual_fn_shapes():
  config = vp_config()
  sde = get_sde(config)
  model = AnalyticVPModel(sde)
  residual_fn = get_likelihood_residual_fn(config, sde, model, {},
                                           variance="scoreflow")
  data = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 1))
  r = residual_fn(data, jax.random.PRNGKey(1), 1e-4)
  assert r.shape == (4,)
  assert np.isfinite(np.asarray(r)).all()


def ve_config(method="pc", predictor="reverse_diffusion",
              corrector="langevin"):
  config = default_config("cifar10")
  override(config, {
      "training": dict(sde="vesde", continuous=True),
      "sampling": dict(method=method, predictor=predictor,
                       corrector=corrector, snr=0.16, n_steps_each=1,
                       noise_removal=True, probability_flow=False),
      "data": dict(image_size=4, num_channels=1, centered=True),
      "model": dict(num_scales=200, sigma_min=0.01, sigma_max=10.0),
  })
  return config


@pytest.mark.parametrize("predictor,corrector", [
    ("reverse_diffusion", "langevin"),
    ("euler_maruyama", "none"),
    ("ancestral_sampling", "none"),
    ("none", "langevin"),
    ("reverse_diffusion", "ald"),
])
def test_pc_sampler_recovers_gaussian(predictor, corrector):
  """Sampling with the exact score of N(0, s^2 I) data must produce samples
  with roughly that std."""
  s = 2.0
  config = ve_config(predictor=predictor, corrector=corrector)
  sde = get_sde(config)
  model = AnalyticVEModel(data_std=s)
  shape = (128, 4, 4, 1)
  sampler = get_sampling_fn(config, sde, shape, inverse_scaler=lambda x: x,
                            eps=config.sampling.truncation_time)
  samples, nfe = jax.jit(lambda key: sampler(model, {}, key))(
      jax.random.PRNGKey(0))
  assert samples.shape == shape
  got_std = float(jnp.std(samples))
  assert abs(got_std - s) / s < 0.25, got_std


def test_ode_sampler_recovers_gaussian():
  s = 2.0
  config = ve_config(method="ode")
  sde = get_sde(config)
  model = AnalyticVEModel(data_std=s)
  shape = (128, 4, 4, 1)
  sampler = get_sampling_fn(config, sde, shape, inverse_scaler=lambda x: x,
                            eps=1e-3)
  samples, nfe = sampler(model, {}, jax.random.PRNGKey(0))
  got_std = float(jnp.std(samples))
  assert abs(got_std - s) / s < 0.25, got_std
  assert int(nfe) > 10


def test_rve_pc_sampler_runs():
  """The reference crashes here (sde_lib.py:404 with next_t=None); we pass
  the grid next_t — verify it runs and produces finite samples."""
  config = default_config("cifar10")
  override(config, {
      "training": dict(sde="reciprocal_vesde", continuous=True, eta=1e-3),
      "sampling": dict(method="pc", predictor="reverse_diffusion",
                       corrector="langevin", snr=0.16, n_steps_each=1,
                       noise_removal=True, probability_flow=False),
      "data": dict(image_size=4, num_channels=1, centered=True),
      "model": dict(num_scales=100, sigma_min=1e-3, sigma_max=10.0),
  })
  sde = get_sde(config)

  class AnalyticRVEModel:
    def apply(self, variables, x, labels, train=False, rngs=None):
      var = 4.0 + labels ** 2
      return -batch_mul(1.0 / var, x)

  shape = (32, 4, 4, 1)
  sampler = get_sampling_fn(config, sde, shape, inverse_scaler=lambda x: x,
                            eps=config.sampling.truncation_time)
  samples, _ = sampler(AnalyticRVEModel(), {}, jax.random.PRNGKey(0))
  assert np.isfinite(np.asarray(samples)).all()


def test_pc_sampler_chunked_matches_single_scan():
  """config.sampling.chunk splits the PC scan into bounded device
  dispatches; with the same key the samples must match the single-scan
  form (same per-step key splits, same order). Tolerance is for XLA
  fusion/reassociation differences between the two compiled programs
  (~1e-6 observed), not algorithmic drift."""
  s = 2.0
  config = ve_config(predictor="reverse_diffusion", corrector="langevin")
  sde = get_sde(config)
  model = AnalyticVEModel(data_std=s)
  shape = (16, 4, 4, 1)
  single = get_sampling_fn(config, sde, shape, inverse_scaler=lambda x: x,
                           eps=config.sampling.truncation_time)
  config.sampling.chunk = 7  # deliberately not dividing N
  chunked = get_sampling_fn(config, sde, shape, inverse_scaler=lambda x: x,
                            eps=config.sampling.truncation_time)
  assert getattr(chunked, "self_jitting", False)
  key = jax.random.PRNGKey(3)
  want, nfe_w = jax.jit(lambda k: single(model, {}, k))(key)
  got, nfe_g = chunked(model, {}, key)
  assert nfe_w == nfe_g
  np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                             rtol=1e-4, atol=1e-5)
