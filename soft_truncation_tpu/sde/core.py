"""Forward/reverse diffusion SDEs as pure functions of (x, t, PRNG key).

TPU-first rebuild of the reference SDE library (reference: sde_lib.py).
Differences from the reference are deliberate design choices, not omissions:

  * No torch tensors or host RNG. Every stochastic routine takes an explicit
    ``jax.random`` key, so the whole training step (including Soft-Truncation
    ``t_min`` sampling, reference sde_lib.py:200-207) jits into one XLA
    program.
  * SDE objects are frozen dataclasses of Python floats. They are static
    w.r.t. jit (hashable), so XLA constant-folds every schedule coefficient.
  * The reciprocal VE SDE's marginal std needs ``pow(b, 2/t)`` with
    ``b = 1 - O(1e-4)``; the reference escapes float32 ``pow`` cancellation by
    computing in float64 (sde_lib.py:381-385). Here the logs of all constants
    are precomputed in Python float64 and the device evaluates
    ``exp((2/t) * log_b)`` — float32-accurate without enabling x64.

Shapes: ``x`` is NHWC ``[B, H, W, C]`` (TPU-native layout), ``t`` is ``[B]``.
Scalar-per-example quantities broadcast via :func:`batch_mul`.

Reference behavior quirk (sde_lib.py:324, :425): as released, random ST
``t_min`` sampling is active only for the VP SDE because VE/RVE
``get_t_min`` default their ``st`` parameter to False and call sites never
pass it. This rebuild implements paper semantics (ST applies to every SDE
when ``training.st`` is set); set ``training.reference_st_quirk = True`` in
the config to reproduce the released reference exactly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def batch_mul(scale: Array, x: Array) -> Array:
  """Multiply per-example scalars ``scale`` ([B]) into ``x`` ([B, ...])."""
  return x * scale.reshape(scale.shape + (1,) * (x.ndim - scale.ndim))


@dataclasses.dataclass(frozen=True)
class SDE:
  """Base diffusion SDE. All concrete SDEs run on time interval (0, T]."""

  N: int = 1000  # number of discretization steps (reference sde_lib.py:11-18)

  @property
  def T(self) -> float:
    return 1.0

  # --- to be overridden -------------------------------------------------
  def sde(self, x: Array, t: Array) -> Tuple[Array, Array]:
    raise NotImplementedError

  def marginal_prob(self, x: Array, t: Array) -> Tuple[Array, Array]:
    raise NotImplementedError

  def prior_sampling(self, key: Array, shape) -> Array:
    raise NotImplementedError

  def prior_logp(self, z: Array) -> Array:
    raise NotImplementedError

  # --- shared helpers ----------------------------------------------------
  def marginal_std(self, t: Array) -> Array:
    """std of p_t(x | x_0) — shape [B]."""
    return self.marginal_prob(jnp.zeros(t.shape + (1, 1, 1)), t)[1]

  def discretize(self, x: Array, t: Array,
                 next_t: Optional[Array] = None) -> Tuple[Array, Array]:
    """Euler-Maruyama default: x_{i+1} = x_i + f + G z (sde_lib.py:56-73)."""
    dt = 1.0 / self.N
    drift, diffusion = self.sde(x, t)
    return drift * dt, diffusion * math.sqrt(dt)

  def perturb(self, key: Array, x: Array, t: Array) -> Tuple[Array, Array, Array]:
    """Sample x_t ~ p_t(.|x_0). Returns (x_t, noise z, std)."""
    z = jax.random.normal(key, x.shape, dtype=x.dtype)
    mean, std = self.marginal_prob(x, t)
    return mean + batch_mul(std, z), z, std

  # --- diffusion-time samplers -------------------------------------------
  def sample_diffusion_time(self, key: Array, batch_size: int, t_min: Array,
                            importance_sampling: bool) -> Tuple[Array, Array]:
    """Sample per-example diffusion times on [t_min, T].

    Returns (t [B], Z) where Z is the importance-sampling normalizer
    (1.0 when sampling uniformly). Mirrors ``get_diffusion_time``
    (reference sde_lib.py:191-198, :314-322, :421-423).
    """
    if importance_sampling:
      return self._importance_time(key, batch_size, t_min)
    u = jax.random.uniform(key, (batch_size,))
    return u * (self.T - t_min) + t_min, jnp.asarray(1.0)

  def _importance_time(self, key, batch_size, t_min):
    raise NotImplementedError(
        f"{type(self).__name__} has no importance sampler.")

  def sample_t_min(self, key: Array, k: float, truncation_time: float) -> Array:
    """Soft-Truncation prior P(t_min) ∝ t_min^{-k} on [eps, T].

    Inverse-CDF sampler matching reference sde_lib.py:200-207 (host
    ``np.random`` there; device key here). ``truncation_time`` is eps.
    """
    u = jax.random.uniform(key, ())
    eps = truncation_time
    if k == 1.0:
      return eps ** (1.0 - u)
    return eps / (1.0 - u * (1.0 - eps ** (k - 1.0))) ** (1.0 / (k - 1.0))


# ---------------------------------------------------------------------------
# VP SDE
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VPSDE(SDE):
  """Variance-preserving SDE: dx = -0.5 beta(t) x dt + sqrt(beta(t)) dw.

  Parity with reference sde_lib.py:121-207.
  """

  beta_0: float = 0.1
  beta_1: float = 20.0
  eps: float = 1e-5  # truncation_time

  def _beta(self, t):
    return self.beta_0 + t * (self.beta_1 - self.beta_0)

  # DDPM grid (sde_lib.py:135-139) — computed lazily, constant-folded by XLA.
  def discrete_betas(self) -> Array:
    return jnp.linspace(self.beta_0 / self.N, self.beta_1 / self.N, self.N)

  def alphas(self) -> Array:
    return 1.0 - self.discrete_betas()

  def sqrt_alphas_cumprod(self) -> Array:
    return jnp.sqrt(jnp.cumprod(self.alphas()))

  def sqrt_1m_alphas_cumprod(self) -> Array:
    return jnp.sqrt(1.0 - jnp.cumprod(self.alphas()))

  def sde(self, x, t):
    beta_t = self._beta(t)
    return batch_mul(-0.5 * beta_t, x), jnp.sqrt(beta_t)

  def _log_mean_coeff(self, t):
    return -0.25 * t ** 2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0

  def marginal_prob(self, x, t):
    lmc = self._log_mean_coeff(t)
    mean = batch_mul(jnp.exp(lmc), x)
    std = jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))
    return mean, std

  def prior_sampling(self, key, shape):
    return jax.random.normal(key, shape)

  def prior_logp(self, z):
    n = math.prod(z.shape[1:])
    axes = tuple(range(1, z.ndim))
    return -n / 2.0 * math.log(2 * math.pi) - jnp.sum(z ** 2, axis=axes) / 2.0

  def discretize(self, x, t, next_t=None):
    """DDPM discretization (sde_lib.py:166-178)."""
    if next_t is None:
      timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
      beta = self.discrete_betas()[timestep]
      alpha = self.alphas()[timestep]
      f = batch_mul(jnp.sqrt(alpha), x) - x
      return f, jnp.sqrt(beta)
    G = jnp.sqrt((t - next_t) * self._beta(t))
    f = batch_mul(jnp.sqrt(1.0 - G ** 2), x) - x
    return f, G

  # --- importance sampling (ScoreFlow trick, sde_lib.py:180-198) ---------
  def integral_beta(self, t):
    return 0.5 * t ** 2 * (self.beta_1 - self.beta_0) + t * self.beta_0

  def antiderivative(self, t, stabilizing_constant=0.0):
    ib = self.integral_beta(t)
    return jnp.log(1.0 - jnp.exp(-ib) + stabilizing_constant) + ib

  def normalizing_constant(self, t_min):
    return self.antiderivative(jnp.asarray(self.T)) - self.antiderivative(t_min)

  def _importance_time(self, key, batch_size, t_min):
    Z = self.normalizing_constant(t_min)
    u = jax.random.uniform(key, (batch_size,))
    bd = self.beta_1 - self.beta_0
    t = (-self.beta_0 + jnp.sqrt(
        self.beta_0 ** 2
        + 2.0 * bd * jnp.log(1.0 + jnp.exp(Z * u + self.antiderivative(t_min)))
    )) / bd
    return t, Z


# ---------------------------------------------------------------------------
# sub-VP SDE
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SubVPSDE(SDE):
  """sub-VP SDE of Song et al. (reference sde_lib.py:209-246).

  NOTE: the reference's subVPSDE.marginal_prob returns std WITHOUT the
  square root (``1 - exp(2 lmc)``, sde_lib.py:237) — reproduced verbatim
  since all consumers assume it.
  """

  beta_0: float = 0.1
  beta_1: float = 20.0
  eps: float = 1e-5

  def sde(self, x, t):
    beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
    drift = batch_mul(-0.5 * beta_t, x)
    discount = 1.0 - jnp.exp(
        -2.0 * self.beta_0 * t - (self.beta_1 - self.beta_0) * t ** 2)
    return drift, jnp.sqrt(beta_t * discount)

  def marginal_prob(self, x, t):
    lmc = -0.25 * t ** 2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
    mean = batch_mul(jnp.exp(lmc), x)
    std = 1.0 - jnp.exp(2.0 * lmc)
    return mean, std

  def prior_sampling(self, key, shape):
    return jax.random.normal(key, shape)

  def prior_logp(self, z):
    n = math.prod(z.shape[1:])
    axes = tuple(range(1, z.ndim))
    return -n / 2.0 * math.log(2 * math.pi) - jnp.sum(z ** 2, axis=axes) / 2.0


# ---------------------------------------------------------------------------
# VE SDE
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VESDE(SDE):
  """Variance-exploding SDE: sigma(t) = sigma_min (sigma_max/sigma_min)^t.

  Parity with reference sde_lib.py:248-332.
  """

  sigma_min: float = 0.01
  sigma_max: float = 50.0
  eps: float = 1e-5

  @property
  def _log_ratio(self) -> float:
    return math.log(self.sigma_max) - math.log(self.sigma_min)

  def discrete_sigmas(self) -> Array:
    return jnp.exp(jnp.linspace(math.log(self.sigma_min),
                                math.log(self.sigma_max), self.N))

  def sigma(self, t):
    return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

  def sde(self, x, t):
    sigma = self.sigma(t)
    return jnp.zeros_like(x), sigma * math.sqrt(2.0 * self._log_ratio)

  def marginal_prob(self, x, t):
    return x, self.sigma(t)

  def prior_sampling(self, key, shape):
    return jax.random.normal(key, shape) * self.sigma_max

  def prior_logp(self, z):
    n = math.prod(z.shape[1:])
    axes = tuple(range(1, z.ndim))
    return (-n / 2.0 * math.log(2 * math.pi * self.sigma_max ** 2)
            - jnp.sum(z ** 2, axis=axes) / (2 * self.sigma_max ** 2))

  def discretize(self, x, t, next_t=None):
    """SMLD (NCSN) discretization (sde_lib.py:288-304)."""
    if next_t is None:
      timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
      sigmas = self.discrete_sigmas()
      sigma = sigmas[timestep]
      adjacent = jnp.where(timestep == 0, jnp.zeros_like(t),
                           sigmas[jnp.maximum(timestep - 1, 0)])
    else:
      sigma = self.sigma(t)
      adjacent = self.sigma(next_t)
    f = jnp.zeros_like(x)
    G = jnp.sqrt(sigma ** 2 - adjacent ** 2)
    return f, G

  def antiderivative(self, t):
    return 2.0 * (math.log(self.sigma_min) + t * self._log_ratio)

  def normalizing_constant(self, t_min):
    return self.antiderivative(jnp.asarray(self.T)) - self.antiderivative(t_min)

  def _importance_time(self, key, batch_size, t_min):
    Z = self.normalizing_constant(t_min)
    u = jax.random.uniform(key, (batch_size,))
    return t_min + (Z * u) / (2.0 * self._log_ratio), Z


# ---------------------------------------------------------------------------
# Reciprocal VE SDE (UNCSN++)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ReciprocalVESDE(SDE):
  """Reparametrized (reciprocal-time) VE SDE for UNCSN++ models.

  sigma(t)^2 = c1 * b1^(2/t) + c2 * b2^(2/t), with constants fixed from
  (eta, sigma_min, sigma_max, eps) exactly as reference sde_lib.py:334-430.
  All constants (and their logs) are derived in Python float64 at
  construction; device math uses exp/log to keep float32 accuracy.
  """

  sigma_min: float = 0.01
  sigma_max: float = 50.0
  eta: float = 1e-5
  eps: float = 1e-5

  # --- derived constants (host float64) ---------------------------------
  @property
  def base_sigma(self) -> float:  # b1, slightly below 1
    return (self.eta / self.sigma_max) ** (1.0 / (1.0 / self.eps - 1.0))

  @property
  def const(self) -> float:  # c1 > 0
    return self.sigma_max ** 2 / self.base_sigma ** 2

  @property
  def base_sigma_2(self) -> float:  # b2, slightly below 1
    return 1.01 ** (-1.0 / (2.0 * (1.0 / self.eps - 1.0)))

  @property
  def const_2(self) -> float:  # c2 (>= 0 when eta <= sigma_min)
    return -(1.01 ** ((1.0 / self.eps) / (1.0 / self.eps - 1.0))) * (
        self.eta ** 2 - self.sigma_min ** 2)

  def _var_terms(self, t):
    """sigma(t)^2 via log-space float32 (see class docstring)."""
    log_b1 = math.log(self.base_sigma)  # host f64
    log_b2 = math.log(self.base_sigma_2)
    inv2t = 2.0 / t
    term1 = self.const * jnp.exp(inv2t * log_b1)
    term2 = self.const_2 * jnp.exp(inv2t * log_b2)
    return term1, term2

  def sigma(self, t):
    term1, term2 = self._var_terms(t)
    return jnp.sqrt(term1 + term2)

  def sde(self, x, t):
    log_b1 = math.log(self.base_sigma)
    log_b2 = math.log(self.base_sigma_2)
    term1, term2 = self._var_terms(t)
    var_rate = (-2.0 * self.const * log_b1) * jnp.exp((2.0 / t) * log_b1) / t ** 2 \
        + 2.0 * self.const_2 * log_b2 * jnp.exp((2.0 / t) * log_b2) / t ** 2
    del term1, term2
    return jnp.zeros_like(x), jnp.sqrt(var_rate)

  def marginal_prob(self, x, t):
    return x, self.sigma(t)

  def prior_sampling(self, key, shape):
    return jax.random.normal(key, shape) * self.sigma_max

  def prior_logp(self, z):
    n = math.prod(z.shape[1:])
    axes = tuple(range(1, z.ndim))
    return (-n / 2.0 * math.log(2 * math.pi * self.sigma_max ** 2)
            - jnp.sum(z ** 2, axis=axes) / (2 * self.sigma_max ** 2))

  def discretize(self, x, t, next_t=None):
    """Reciprocal-SMLD discretization (sde_lib.py:395-411).

    G = sqrt(sigma(t)^2 - sigma(next_t)^2). Adjacent grid sigmas cancel
    catastrophically in float32 (the reference dodges this with float64),
    so each c_i (b_i^{2/t} - b_i^{2/nt}) term is computed as
    c_i b_i^{2/nt} expm1(2 log b_i (1/t - 1/nt)) which stays accurate for
    close (t, next_t). ``next_t == 0`` means sigma(next) = 0.
    """
    assert next_t is not None, "reciprocal VE SDE requires an explicit next_t"
    log_b1 = math.log(self.base_sigma)
    log_b2 = math.log(self.base_sigma_2)
    safe_nt = jnp.where(next_t > 0.0, next_t, t)  # avoids inf*0 -> nan
    # c (b^{2/t} - b^{2/nt}) = -c b^{2/t} expm1((2/nt - 2/t) log b); the
    # expm1 argument is <= 0 (t >= nt, log b < 0), so no overflow and the
    # dominant factor b^{2/t} carries the magnitude.
    dinv = 2.0 * (1.0 / safe_nt - 1.0 / t)  # >= 0
    d1 = -self.const * jnp.exp((2.0 / t) * log_b1) * jnp.expm1(dinv * log_b1)
    d2 = -self.const_2 * jnp.exp((2.0 / t) * log_b2) * jnp.expm1(dinv * log_b2)
    var_diff = jnp.where(next_t > 0.0, d1 + d2, self.sigma(t) ** 2)
    f = jnp.zeros_like(x)
    G = jnp.sqrt(jnp.maximum(var_diff, 0.0))
    return f, G

  def transform(self, sigmas):
    """Low-sigma-stabilized log transform (sde_lib.py:413-419).

    Used only when training.model_mode == 'reciprocal' AND training.sde is
    spelled 'reciprocal_sde' in the reference (a dead branch there,
    models/ncsnpp.py:265); kept for completeness.
    """
    sigma_0_t = math.log((-self.sigma_min ** 2 + self.eta ** 2 + 0.01 ** 2)
                         / self.const) / (2.0 * math.log(self.base_sigma))
    sigma_0 = math.sqrt(self.const * self.base_sigma ** (2.0 * sigma_0_t)
                        + self.const_2 * self.base_sigma_2 ** (2.0 * sigma_0_t))
    c_1 = (sigma_0 / math.log(self.base_sigma)
           * (math.log(sigma_0) - math.log(self.sigma_max))
           / (sigma_0_t - 1.0 / self.T))
    c_2 = math.log(sigma_0) + c_1 / sigma_0
    return ((sigmas > 0.01) * jnp.log(jnp.maximum(sigmas, 1e-20))
            + (sigmas < 0.01) * (-c_1 / (sigmas + 1e-4) + c_2))

  def sample_diffusion_time(self, key, batch_size, t_min,
                            importance_sampling=False):
    """Uniform in reciprocal time (sde_lib.py:421-423); IS flag is ignored
    exactly as in the reference."""
    u = jax.random.uniform(key, (batch_size,))
    time = u * (1.0 / t_min - 1.0 / self.T) + 1.0 / self.T
    return 1.0 / time, jnp.asarray(1.0)

  def sample_t_min(self, key, k, truncation_time):
    """ST prior uniform in reciprocal time (sde_lib.py:425-430)."""
    u = jax.random.uniform(key, ())
    max_ = u * (1.0 / truncation_time - 1.0 / self.T) + 1.0 / self.T
    return 1.0 / max_


# ---------------------------------------------------------------------------
# Reverse-time SDE / probability-flow ODE
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ReverseSDE:
  """Reverse-time SDE dx = [f - g^2 * score * w] dt + lambda g dw.

  lambda interpolates SDE (1) -> probability-flow ODE (0); the drift weight
  is 0.5 (1 + lambda^2), matching reference sde_lib.py:75-119.
  """

  forward: SDE
  score_fn: Callable[[Array, Array], Array]
  probability_flow: bool = False
  lambda_: float = 1.0

  def __post_init__(self):
    # probability_flow=True needs lambda_=0 (an ODE has no diffusion term).
    # The converse combination (probability_flow=False, lambda_=0) is
    # ACCEPTED: drift weight 0.5*(1+0^2)=0.5 and diffusion 0*g are exactly
    # the probability-flow ODE (sde_lib.py:89-119 — both branches coincide),
    # and configs may legitimately request it (eval.lambda_=0 without
    # flipping eval.probability_flow).
    if self.probability_flow:
      assert self.lambda_ == 0.0, (
          "probability_flow=True requires lambda_=0 "
          f"(got lambda_={self.lambda_})")

  @property
  def weight(self) -> float:
    return 0.5 if self.probability_flow else 0.5 * (1.0 + self.lambda_ ** 2)

  @property
  def N(self) -> int:
    return self.forward.N

  @property
  def T(self) -> float:
    return self.forward.T

  def sde(self, x, t):
    drift, diffusion = self.forward.sde(x, t)
    score = self.score_fn(x, t)
    drift = drift - batch_mul(diffusion ** 2, score) * self.weight
    return drift, self.lambda_ * diffusion

  def discretize(self, x, t, next_t=None):
    f, G = self.forward.discretize(x, t, next_t)
    rev_f = f - batch_mul(G ** 2, self.score_fn(x, t)) * self.weight
    return rev_f, self.lambda_ * G


# ---------------------------------------------------------------------------
# Factory
# ---------------------------------------------------------------------------


def get_sde(config) -> SDE:
  """Build the SDE named by ``config.training.sde`` (sde_lib.py:433-445)."""
  name = config.training.sde.lower()
  if name == "vpsde":
    return VPSDE(beta_0=config.model.beta_min, beta_1=config.model.beta_max,
                 N=config.model.num_scales,
                 eps=config.training.truncation_time)
  if name == "subvpsde":
    return SubVPSDE(beta_0=config.model.beta_min, beta_1=config.model.beta_max,
                    N=config.model.num_scales,
                    eps=config.training.truncation_time)
  if name == "vesde":
    return VESDE(sigma_min=config.model.sigma_min,
                 sigma_max=config.model.sigma_max,
                 N=config.model.num_scales)
  if name == "reciprocal_vesde":
    return ReciprocalVESDE(sigma_min=config.model.sigma_min,
                           sigma_max=config.model.sigma_max,
                           N=config.model.num_scales,
                           eta=config.training.eta)
  if name == "rve-sde":
    # legacy flat ve/*_uncsn.py configs use this spelling with
    # config.uncsn.eta; the reference's own get_sde rejects it
    # (sde_lib.py:433-443 has no such branch), so those configs are
    # unrunnable there — honored here.
    return ReciprocalVESDE(sigma_min=config.model.sigma_min,
                           sigma_max=config.model.sigma_max,
                           N=config.model.num_scales,
                           eta=config.uncsn.eta)
  raise NotImplementedError(f"SDE {config.training.sde} unknown.")


def st_active_for(sde: SDE, config) -> bool:
  """Whether Soft-Truncation t_min sampling applies for this run.

  Paper semantics by default; ``training.reference_st_quirk`` restores the
  released reference behavior where only VPSDE honors training.st
  (see module docstring).
  """
  st = bool(config.training.st)
  if not st:
    return False
  if config.training.get("reference_st_quirk", False):
    return isinstance(sde, VPSDE)
  return True
