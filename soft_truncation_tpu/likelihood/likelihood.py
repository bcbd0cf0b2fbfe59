"""Exact NLL (probability-flow ODE), single-sample NELBO, and the
truncation-boundary residual terms.

Parity target: reference likelihood.py. TPU-first differences:

  * The probability-flow bpd ODE integrates on device with the jittable
    dopri5 (ode.py) — the reference's scipy solver copies
    device->numpy->device on every function evaluation
    (likelihood.py:94-111).
  * Hutchinson-Skilling divergence uses ``jax.jvp`` (forward-mode
    eps^T (J eps)) instead of autograd vjp — one extra forward instead of
    a backward, cheaper for wide U-Nets and exactly the same estimator.
  * Explicit PRNG keys everywhere.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.score import get_score_fn
from ..sde.core import SDE, ReverseSDE, batch_mul
from ..sample.ode import odeint_dopri5

Array = jax.Array


def _hutchinson_noise(key, shape, hutchinson_type: str):
  if hutchinson_type == "Gaussian":
    return jax.random.normal(key, shape)
  if hutchinson_type == "Rademacher":
    return jax.random.rademacher(key, shape, dtype=jnp.float32)
  raise NotImplementedError(f"Hutchinson type {hutchinson_type} unknown.")


def get_div_fn(fn: Callable[[Array, Array], Array]):
  """Hutchinson-Skilling divergence of x -> fn(x, t) via jvp
  (reference likelihood.py:27-38 uses a vjp; same estimator)."""

  def div_fn(x: Array, t: Array, eps: Array) -> Array:
    _, jvp_val = jax.jvp(lambda xx: fn(xx, t), (x,), (eps,))
    return jnp.sum((jvp_val * eps).reshape(x.shape[0], -1), axis=-1)

  return div_fn


# ---------------------------------------------------------------------------
# Exact bpd via the probability-flow ODE (reference likelihood.py:42-134)
# ---------------------------------------------------------------------------


def get_likelihood_fn(config, sde: SDE, inverse_scaler,
                      hutchinson_type: str = "Rademacher",
                      rtol: float = 1e-5, atol: float = 1e-5,
                      method: str = "dopri5",
                      shared_primal: bool = True) -> Callable:
  """Returns likelihood_fn(model, params, data, key, logdet=0., eps=1e-5,
  mode='correct') -> (bpd [B], z latent, nfe).

  shared_primal=True (default) evaluates the network ONCE per RK stage:
  ``jax.jvp`` returns the primal (the drift) alongside the Hutchinson
  tangent, so each ODE-function evaluation costs ~2 forwards instead of
  3 (standalone drift + jvp's internal primal — the two produce the same
  HLO values but XLA does not CSE across the separate network
  applications; measured pair in benchmarks/likelihood.jsonl). False
  keeps the two-pass form for A/B.
  """
  del method  # always the on-device dopri5

  def drift_fn(model, params, x, t):
    score_fn = get_score_fn(config, sde, model, params, train=False,
                            continuous=True)
    rsde = ReverseSDE(sde, score_fn,
                      probability_flow=config.eval.probability_flow,
                      lambda_=config.eval.lambda_)
    return rsde.sde(x, t)[0]

  def likelihood_fn(model, params, data: Array, key: Array,
                    logdet=0.0, eps: float = 1e-5,
                    mode: str = "correct") -> Tuple[Array, Array, Array]:
    shape = data.shape
    b = shape[0]
    n_flat = data.size
    k_hutch, k_pert, k_resid = jax.random.split(key, 3)
    epsilon = _hutchinson_noise(k_hutch, shape, hutchinson_type)

    div_fn = get_div_fn(lambda xx, tt: drift_fn(model, params, xx, tt))

    def ode_func(t, flat):
      x = flat[:n_flat].reshape(shape)
      vec_t = jnp.full((b,), t)
      if shared_primal:
        drift, jvp_val = jax.jvp(
            lambda xx: drift_fn(model, params, xx, vec_t), (x,), (epsilon,))
        logp_grad = jnp.sum((jvp_val * epsilon).reshape(b, -1), axis=-1)
      else:
        drift = drift_fn(model, params, x, vec_t)
        logp_grad = div_fn(x, vec_t, epsilon)
      return jnp.concatenate([drift.reshape(-1), logp_grad])

    if mode == "correct":
      z0 = jax.random.normal(k_pert, shape)
      mean, std = sde.marginal_prob(data, jnp.full((b,), eps))
      init_x = mean + batch_mul(std, z0)
    elif mode == "wrong":
      init_x = data
    else:
      raise NotImplementedError(mode)

    init = jnp.concatenate([init_x.reshape(-1), jnp.zeros((b,))])
    result = odeint_dopri5(ode_func, init, eps, sde.T, rtol=rtol, atol=atol)
    z = result.y[:n_flat].reshape(shape)
    delta_logp = result.y[n_flat:]
    prior_logp = sde.prior_logp(z)

    if mode == "correct":
      residual_fn = get_likelihood_residual_fn(config, sde, model, params,
                                               variance="scoreflow")
      residual_nll = residual_fn(data, k_resid, eps)
      delta_logp = delta_logp - residual_nll

    n_dim = math.prod(shape[1:])
    bpd = -(prior_logp + delta_logp + logdet) / math.log(2) / n_dim
    offset = 7.0 - inverse_scaler(-1.0)
    return bpd + offset, z, result.nfe

  return likelihood_fn


# ---------------------------------------------------------------------------
# Single-sample NELBO (reference likelihood.py:136-208)
# ---------------------------------------------------------------------------


def get_elbo_fn(config, sde: SDE, inverse_scaler=None,
                hutchinson_type: str = "Rademacher") -> Callable:
  """Returns loss_fn(model, params, batch, key, logdet=0., eps=1e-5) ->
  (nelbo bpd [B], residual bpd [B])."""

  def loss_fn(model, params, batch: Array, key: Array, logdet=0.0,
              eps: float = 1e-5):
    b = batch.shape[0]
    k_t, k_z, k_h, k_lp, k_res = jax.random.split(key, 5)
    score_fn = get_score_fn(config, sde, model, params, train=False,
                            continuous=True)

    time, Z = sde.sample_diffusion_time(k_t, b, jnp.asarray(eps),
                                        importance_sampling=True)
    is_rve = config.training.sde.lower() == "reciprocal_vesde"
    qt = (1.0 / (1.0 / eps - 1.0 / sde.T)) if is_rve else 1.0 / (sde.T - eps)

    z = jax.random.normal(k_z, batch.shape)
    mean, std = sde.marginal_prob(batch, time)
    perturbed = mean + batch_mul(std, z)

    def mu_fn(x):
      score = score_fn(x, time)
      f, g = sde.sde(x, time)
      mu = (batch_mul(std ** 2, score)
            - batch_mul(std ** 2 / g ** 2, f))
      return mu, score

    epsilon = _hutchinson_noise(k_h, batch.shape, hutchinson_type)
    # eps^T dmu/dx eps via jvp (reference: autograd.grad(mu, x, eps),
    # likelihood.py:190-192). has_aux returns the primal-pass score so the
    # Nu term below reuses the SAME network evaluation instead of a second
    # standalone apply (XLA does not CSE across applications).
    _, jvp_val, score = jax.jvp(mu_fn, (perturbed,), (epsilon,),
                                has_aux=True)
    a = batch_mul(std, score)
    Mu = -jnp.sum((jvp_val * epsilon).reshape(b, -1), axis=-1) * Z / qt
    Nu = -jnp.sum((a ** 2).reshape(b, -1), axis=-1) * Z / 2.0 / qt

    lp_t = jnp.full((b,), sde.T)
    lp_z = jax.random.normal(k_lp, batch.shape)
    lp_mean, lp_std = sde.marginal_prob(batch, lp_t)
    lp = sde.prior_logp(lp_mean + batch_mul(lp_std, lp_z))

    rve_scale = (2.0 * eps * math.log(sde.sigma_max / sde.sigma_min)
                 if is_rve else 1.0)
    elbos = lp + (Mu + Nu) * rve_scale

    n_dim = math.prod(batch.shape[1:])
    residual_fn = get_likelihood_residual_fn(config, sde, model, params,
                                             variance="scoreflow")
    nelbo_bpd = (-(elbos + logdet) / n_dim / math.log(2)
                 + 7.0 - inverse_scaler(-1.0))
    residual_bpd = residual_fn(batch, k_res, eps) / n_dim / math.log(2)
    return nelbo_bpd, residual_bpd

  return loss_fn


# ---------------------------------------------------------------------------
# Truncation-boundary residual (reference likelihood.py:210-314)
# ---------------------------------------------------------------------------


def _approx_standard_normal_cdf(x):
  return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi)
                               * (x + 0.044715 * x ** 3)))


def _discretized_gaussian_log_likelihood(x, means, log_scales):
  assert x.shape == means.shape
  centered = x - means
  inv_stdv = jnp.exp(-log_scales)
  cdf_plus = _approx_standard_normal_cdf(inv_stdv * (centered + 1.0 / 255.0))
  cdf_min = _approx_standard_normal_cdf(inv_stdv * (centered - 1.0 / 255.0))
  log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
  log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
  cdf_delta = cdf_plus - cdf_min
  return jnp.where(
      x < -0.999, log_cdf_plus,
      jnp.where(x > 0.999, log_one_minus_cdf_min,
                jnp.log(jnp.maximum(cdf_delta, 1e-12))))


def get_likelihood_residual_fn(config, sde: SDE, model, params,
                               variance: str = "ddpm") -> Callable:
  """residual_fn(batch, key, eps=None) -> per-example residual nats.

  Gaussian decoder (likelihood.py:277-309) or the discretized-Gaussian
  "lossless" decoder (likelihood.py:236-275), chosen by
  config.data.dequantization.
  """
  score_fn = get_score_fn(config, sde, model, params, train=False,
                          continuous=True)
  lossless = config.data.dequantization == "lossless"
  centered = config.data.centered

  def residual_fn(batch: Array, key: Array,
                  eps: Optional[float] = None) -> Array:
    if eps is None:
      eps = sde.eps
    b = batch.shape[0]
    eps_vec = jnp.full((b,), eps)
    mean, std = sde.marginal_prob(batch, eps_vec)
    z = jax.random.normal(key, batch.shape)
    perturbed = mean + batch_mul(std, z)
    score = score_fn(perturbed, eps_vec)

    alpha, beta = sde.marginal_prob(jnp.ones_like(batch), eps_vec)
    q_mean = perturbed / alpha + batch_mul(beta ** 2, score) / alpha
    if variance == "ddpm":
      q_std = beta
    elif variance == "scoreflow":
      q_std = beta / jnp.mean(alpha, axis=(1, 2, 3))
    else:
      raise ValueError(variance)

    n_dim = math.prod(batch.shape[1:])
    if lossless:
      x = batch
      qm = q_mean
      qs = q_std
      if not centered:
        x = 2.0 * x - 1.0
        qm = 2.0 * qm - 1.0
        qs = 2.0 * qs
      decoder_nll = -_discretized_gaussian_log_likelihood(
          x, means=qm, log_scales=jnp.log(qs).reshape(b, 1, 1, 1))
      p_entropy = n_dim / 2.0 * (math.log(2 * math.pi)
                                 + 2 * jnp.log(std) + 1.0)
      return decoder_nll.sum(axis=(1, 2, 3)) - p_entropy

    p_entropy = n_dim / 2.0 * (math.log(2 * math.pi)
                               + 2 * jnp.log(std) + 1.0)
    q_recon = (n_dim / 2.0 * (math.log(2 * math.pi) + 2 * jnp.log(q_std))
               + 0.5 / (q_std ** 2)
               * jnp.square(batch - q_mean).sum(axis=(1, 2, 3)))
    return q_recon - p_entropy

  return residual_fn
