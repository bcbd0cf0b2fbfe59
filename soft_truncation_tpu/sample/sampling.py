"""Samplers: Predictor-Corrector (one lax.scan) and probability-flow ODE.

Parity target: reference sampling.py. TPU-first differences:

  * The N-step PC loop is a single ``lax.scan`` inside jit — the reference
    re-builds the predictor object and score_fn every step on the host
    (sampling.py:343-362), costing Python dispatch per step.
  * The ODE sampler uses the on-device dopri5 integrator (ode.py) instead
    of scipy with host round-trips per NFE (sampling.py:485-493).
  * Everything takes explicit PRNG keys.

Reference bug worth knowing (NOT reproduced): with the reciprocal VE SDE,
the PC loop calls discretize(x, t, next_t=None) which crashes in the
reference (sde_lib.py:404 dereferences next_t.type). Here the PC sampler
always passes the true next grid time to predictors that use it, which is
the intended continuous-time discretization (sampling.py:205 supports it).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..models.score import get_score_fn
from ..sde.core import (SDE, VESDE, VPSDE, ReciprocalVESDE, ReverseSDE,
                        SubVPSDE, batch_mul)
from .ode import odeint_dopri5

Array = jax.Array

_PREDICTORS = {}
_CORRECTORS = {}


def register_predictor(fn=None, *, name=None):
  def _register(f):
    local = name or f.__name__
    if local in _PREDICTORS:
      raise ValueError(f"already registered predictor: {local}")
    _PREDICTORS[local] = f
    return f
  return _register if fn is None else _register(fn)


def register_corrector(fn=None, *, name=None):
  def _register(f):
    local = name or f.__name__
    if local in _CORRECTORS:
      raise ValueError(f"already registered corrector: {local}")
    _CORRECTORS[local] = f
    return f
  return _register if fn is None else _register(fn)


def get_predictor(name: str):
  return _PREDICTORS[name.lower()]


def get_corrector(name: str):
  return _CORRECTORS[name.lower()]


# ---------------------------------------------------------------------------
# Predictors (reference sampling.py:185-260). Signature:
#   predictor(rsde, x, t, key, next_t) -> (x, x_mean)
# ---------------------------------------------------------------------------


@register_predictor(name="euler_maruyama")
def euler_maruyama_predictor(rsde: ReverseSDE, x, t, key, next_t=None):
  dt = -1.0 / rsde.N
  z = jax.random.normal(key, x.shape)
  drift, diffusion = rsde.sde(x, t)
  x_mean = x + drift * dt
  x = x_mean + batch_mul(diffusion, z) * jnp.sqrt(-dt)
  return x, x_mean


@register_predictor(name="reverse_diffusion")
def reverse_diffusion_predictor(rsde: ReverseSDE, x, t, key, next_t=None):
  f, G = rsde.discretize(x, t, next_t)
  z = jax.random.normal(key, x.shape)
  x_mean = x - f
  x = x_mean + batch_mul(G, z)
  return x, x_mean


@register_predictor(name="ancestral_sampling")
def ancestral_sampling_predictor(rsde: ReverseSDE, x, t, key, next_t=None):
  """VE/VP only (reference sampling.py:214-249)."""
  sde = rsde.forward
  score_fn = rsde.score_fn
  z = jax.random.normal(key, x.shape)
  if isinstance(sde, VESDE):
    timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
    sigmas = sde.discrete_sigmas()
    sigma = sigmas[timestep]
    adjacent = jnp.where(timestep == 0, jnp.zeros_like(t),
                         sigmas[jnp.maximum(timestep - 1, 0)])
    score = score_fn(x, t)
    x_mean = x + batch_mul(sigma ** 2 - adjacent ** 2, score)
    std = jnp.sqrt(adjacent ** 2 * (sigma ** 2 - adjacent ** 2) / sigma ** 2)
    return x_mean + batch_mul(std, z), x_mean
  if isinstance(sde, VPSDE):
    timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
    beta = sde.discrete_betas()[timestep]
    score = score_fn(x, t)
    x_mean = batch_mul(1.0 / jnp.sqrt(1.0 - beta),
                       x + batch_mul(beta, score))
    return x_mean + batch_mul(jnp.sqrt(beta), z), x_mean
  raise NotImplementedError(
      f"SDE class {type(sde).__name__} not yet supported.")


@register_predictor(name="none")
def none_predictor(rsde, x, t, key, next_t=None):
  return x, x


# ---------------------------------------------------------------------------
# Correctors (reference sampling.py:263-340). Signature:
#   corrector(sde, score_fn, x, t, key, snr, n_steps) -> (x, x_mean)
# ---------------------------------------------------------------------------


def _corrector_alpha(sde: SDE, t):
  if isinstance(sde, (VPSDE, SubVPSDE)):
    timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
    return sde.alphas()[timestep] if isinstance(sde, VPSDE) else \
        jnp.ones_like(t)
  return jnp.ones_like(t)


@register_corrector(name="langevin")
def langevin_corrector(sde, score_fn, x, t, key, snr, n_steps):
  """SNR-adaptive Langevin steps (reference sampling.py:264-292)."""
  alpha = _corrector_alpha(sde, t)

  def body(carry, k):
    x, _ = carry
    grad = score_fn(x, t)
    noise = jax.random.normal(k, x.shape)
    grad_norm = jnp.mean(
        jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=-1))
    noise_norm = jnp.mean(
        jnp.linalg.norm(noise.reshape(noise.shape[0], -1), axis=-1))
    step_size = (snr * noise_norm / grad_norm) ** 2 * 2 * alpha
    x_mean = x + batch_mul(step_size, grad)
    x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise)
    return (x, x_mean), None

  keys = jax.random.split(key, n_steps)
  (x, x_mean), _ = jax.lax.scan(body, (x, x), keys)
  return x, x_mean


@register_corrector(name="ald")
def annealed_langevin_corrector(sde, score_fn, x, t, key, snr, n_steps):
  """Original NCSN annealed Langevin (reference sampling.py:296-329)."""
  alpha = _corrector_alpha(sde, t)
  std = sde.marginal_prob(x, t)[1]

  def body(carry, k):
    x, _ = carry
    grad = score_fn(x, t)
    noise = jax.random.normal(k, x.shape)
    step_size = (snr * std) ** 2 * 2 * alpha
    x_mean = x + batch_mul(step_size, grad)
    x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise)
    return (x, x_mean), None

  keys = jax.random.split(key, n_steps)
  (x, x_mean), _ = jax.lax.scan(body, (x, x), keys)
  return x, x_mean


@register_corrector(name="none")
def none_corrector(sde, score_fn, x, t, key, snr, n_steps):
  return x, x


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------


def get_sampling_fn(config, sde: SDE, shape, inverse_scaler,
                    eps: float) -> Callable:
  """Dispatch on config.sampling.method (reference sampling.py:80-125).

  Returns sampler(model, params, key) -> (samples in [0,1], nfe).
  ``shape`` is NHWC.
  """
  name = config.sampling.method.lower()
  if name == "ode":
    return get_ode_sampler(config, sde, shape, inverse_scaler,
                           denoise=config.sampling.noise_removal, eps=eps)
  if name == "dpm_solver":
    return get_dpm_solver_sampler(
        config, sde, shape, inverse_scaler,
        steps=config.sampling.get("dpm_steps", 50),
        denoise=config.sampling.noise_removal, eps=eps)
  if name == "picard_dpm":
    # Parallel-in-time DPM-Solver++(2M) (beyond parity, see parallel.py).
    from .parallel import get_picard_dpm_sampler
    return get_picard_dpm_sampler(
        config, sde, shape, inverse_scaler,
        steps=config.sampling.get("dpm_steps", 50),
        denoise=config.sampling.noise_removal, eps=eps,
        window=config.sampling.get("picard_window", 0),
        tol=config.sampling.get("picard_tol", 1e-2),
        max_sweeps=config.sampling.get("picard_max_sweeps", 0))
  if name in ("pc", "picard"):
    kwargs = dict(
        predictor=config.sampling.predictor.lower(),
        corrector=config.sampling.corrector.lower(),
        inverse_scaler=inverse_scaler,
        snr=config.sampling.snr,
        n_steps=config.sampling.n_steps_each,
        probability_flow=config.sampling.probability_flow,
        continuous=config.training.continuous,
        denoise=config.sampling.noise_removal,
        eps=eps)
    if name == "picard":
      # Parallel-in-time PC (beyond parity, see parallel.py); late import:
      # parallel.py uses this module's predictor/corrector registries.
      from .parallel import get_picard_pc_sampler
      return get_picard_pc_sampler(
          config, sde, shape,
          window=config.sampling.get("picard_window", 64),
          tol=config.sampling.get("picard_tol", 1e-2),
          max_sweeps=config.sampling.get("picard_max_sweeps", 0),
          unsafe_tol=config.sampling.get("picard_unsafe_tol", False),
          **kwargs)
    return get_pc_sampler(config, sde, shape, **kwargs)
  raise ValueError(f"Sampler name {config.sampling.method} unknown.")


def _denoise_step(config, sde, score_fn, x, eps, probability_flow=True):
  """Final step to t=0 mean (reference sampling.py:402-408)."""
  rsde = ReverseSDE(sde, score_fn,
                    probability_flow=probability_flow,
                    lambda_=0.0 if probability_flow else 1.0)
  vec_eps = jnp.full((x.shape[0],), eps)
  f, G = rsde.discretize(x, vec_eps, jnp.zeros_like(vec_eps))
  return x - f


def get_pc_sampler(config, sde: SDE, shape, predictor: str, corrector: str,
                   inverse_scaler, snr: float, n_steps: int = 1,
                   probability_flow: bool = False, continuous: bool = False,
                   denoise: bool = True, eps: float = 1e-3) -> Callable:
  """Predictor-Corrector sampler as one scan (reference sampling.py:365-433).

  ``config.sampling.chunk > 0`` splits the N-step scan into bounded-length
  device dispatches (state carried on device between them, results are
  bit-identical to the single-scan form). Long single dispatches (tens of
  seconds at large batch) can trip runtime watchdogs on tunneled/remote
  TPU runtimes; chunking also bounds lost work under preemption. The
  chunked sampler jits its segments internally — do NOT wrap it in an
  outer jit (get_sampling_fn tags it with ``self_jitting=True``).
  """
  predictor_fn = get_predictor(predictor)
  corrector_fn = get_corrector(corrector)
  N = sde.N
  chunk = int(config.sampling.get("chunk", 0) or 0)
  timesteps_host = jnp.linspace(sde.T, eps, N)
  next_timesteps_host = jnp.concatenate([timesteps_host[1:],
                                         jnp.zeros((1,))])

  def _scan(model, params, x, key, idxs):
    """Scan PC steps for global step indices ``idxs``; returns the carried
    (x, key) and the last x_mean of the segment."""
    score_fn = get_score_fn(config, sde, model, params, train=False,
                            continuous=continuous)
    rsde = ReverseSDE(sde, score_fn, probability_flow=probability_flow,
                      lambda_=0.0 if probability_flow else 1.0)

    def body(carry, i):
      x, key = carry
      key, k_c, k_p = jax.random.split(key, 3)
      t_vec = jnp.full((shape[0],), timesteps_host[i])
      nt_vec = jnp.full((shape[0],), next_timesteps_host[i])
      x, x_mean = corrector_fn(sde, score_fn, x, t_vec, k_c, snr, n_steps)
      x, x_mean = predictor_fn(
          rsde, x, t_vec, k_p,
          next_t=nt_vec if isinstance(sde, ReciprocalVESDE) else None)
      return (x, key), x_mean

    (x, key), x_means = jax.lax.scan(body, (x, key), idxs)
    return x, key, x_means[-1]

  def _finish(model, params, x, x_mean):
    score_fn = get_score_fn(config, sde, model, params, train=False,
                            continuous=continuous)
    out = _denoise_step(config, sde, score_fn, x_mean if denoise else x,
                        sde.eps, probability_flow=True)
    return inverse_scaler(out)

  if 0 < chunk < N:
    seg_jit = jax.jit(_scan, static_argnums=0)
    finish_jit = jax.jit(_finish, static_argnums=0)

    def sampler(model, params, key) -> Tuple[Array, int]:
      key, k_prior = jax.random.split(key)
      x = sde.prior_sampling(k_prior, shape)
      x_mean = x
      for s in range(0, N, chunk):
        idxs = jnp.arange(s, min(s + chunk, N))
        x, key, x_mean = seg_jit(model, params, x, key, idxs)
      return finish_jit(model, params, x, x_mean), N * (n_steps + 1)

    sampler.self_jitting = True
    return sampler

  def sampler(model, params, key) -> Tuple[Array, int]:
    key, k_prior = jax.random.split(key)
    x = sde.prior_sampling(k_prior, shape)
    x, key, x_mean = _scan(model, params, x, key, jnp.arange(N))
    return _finish(model, params, x, x_mean), N * (n_steps + 1)

  return sampler


def _dpm_schedule(sde: SDE, N: int, eps: float):
  """Uniform-log-SNR time grid + affine-marginal coefficients, shared by
  the sequential (below) and parallel-in-time (parallel.py) DPM solvers.

  Uniform-lambda is the DPM-Solver prescription: invert the monotone
  lambda(t) on a fine grid. Uniform-t is a poor lambda grid for VP
  (most of the log-SNR range is crossed near t=eps)."""
  def lam_of(t):
    mean, s = sde.marginal_prob(jnp.ones(t.shape + (1, 1, 1)), t)
    return jnp.log(mean.reshape(t.shape)) - jnp.log(s)

  t_fine = jnp.linspace(sde.T, eps, 4096)  # lam increasing along axis
  lam_fine = lam_of(t_fine)
  lam_grid = jnp.linspace(lam_fine[0], lam_fine[-1], N + 1)
  ts = jnp.interp(lam_grid, lam_fine, t_fine)
  ts = ts.at[0].set(sde.T).at[-1].set(eps)

  mean, s_all = sde.marginal_prob(jnp.ones((N + 1, 1, 1, 1)), ts)
  c_all = mean.reshape(N + 1)  # affine-marginal mean coefficient c(t)
  lam = jnp.log(c_all) - jnp.log(s_all)  # log-SNR; increases as t -> eps
  return ts, c_all, s_all, lam


def _dpm_data_pred_fn(score_fn, shape, ts, c_all, s_all):
  """Data prediction x0 = (x + s^2 * score) / c at grid index i."""
  def data_pred(x, i):
    t_vec = jnp.full((shape[0],), ts[i])
    return (x + (s_all[i] ** 2) * score_fn(x, t_vec)) / c_all[i]
  return data_pred


def _dpm_step_fn(data_pred, c_all, s_all, lam):
  """One DPM-Solver++(2M) update on the augmented state (x, prev data
  prediction); returns ((x', d), x'). The update in log-SNR time, with
  h_i = lambda_{i+1} - lambda_i:

      x_{i+1} = (s_{i+1}/s_i) x_i - c_{i+1} (e^{-h_i} - 1) D_i
      D_i = (1 + k) x0_i - k x0_{i-1},   k = h_i / (2 h_{i-1})

  (first step falls back to the order-1 update, i.e. DDIM)."""
  def dpm_step(s, i):
    x, prev_d = s
    d = data_pred(x, i)
    h = lam[i + 1] - lam[i]
    h_prev = lam[i] - lam[jnp.maximum(i - 1, 0)]  # 0 at the first step
    k = jnp.where(h_prev > 0, h / (2.0 * h_prev), 0.0)
    D = (1.0 + k) * d - k * prev_d
    x = (s_all[i + 1] / s_all[i]) * x - c_all[i + 1] * jnp.expm1(-h) * D
    return (x, d), x
  return dpm_step


def get_dpm_solver_sampler(config, sde: SDE, shape, inverse_scaler,
                           steps: int = 50, denoise: bool = True,
                           eps: float = 1e-3) -> Callable:
  """DPM-Solver++(2M): second-order multistep solver for the diffusion
  ODE in data-prediction form (Lu et al., arXiv:2211.01095).

  A beyond-parity fast sampler (the reference offers only PC and
  black-box-ODE sampling): one score evaluation per step, and 20-50
  steps typically match the sample quality of the 1000-2000-NFE PC
  sampler on trained models. Works for any SDE with an affine marginal
  x_t ~ N(c(t) x_0, s(t)^2 I) (all four SDE families here) — see
  _dpm_schedule/_dpm_step_fn for the math. With ``denoise`` the final
  state is replaced by its data prediction at eps.
  """
  N = int(steps)

  def sampler(model, params, key) -> Tuple[Array, int]:
    score_fn = get_score_fn(config, sde, model, params, train=False,
                            continuous=True)
    key, k_prior = jax.random.split(key)
    x = sde.prior_sampling(k_prior, shape)

    ts, c_all, s_all, lam = _dpm_schedule(sde, N, eps)
    data_pred = _dpm_data_pred_fn(score_fn, shape, ts, c_all, s_all)
    dpm_step = _dpm_step_fn(data_pred, c_all, s_all, lam)

    (x, _), _ = jax.lax.scan(lambda c, i: (dpm_step(c, i)[0], None),
                             (x, jnp.zeros_like(x)), jnp.arange(N))
    nfe = N
    if denoise:
      x = data_pred(x, N)
      nfe += 1
    return inverse_scaler(x), nfe

  return sampler


def get_ode_sampler(config, sde: SDE, shape, inverse_scaler,
                    denoise: bool = False, rtol: float = 1e-5,
                    atol: float = 1e-5, eps: float = 1e-3) -> Callable:
  """Probability-flow ODE sampler, on-device adaptive dopri5
  (reference sampling.py:436-504)."""

  def sampler(model, params, key) -> Tuple[Array, Array]:
    score_fn = get_score_fn(config, sde, model, params, train=False,
                            continuous=True)
    rsde = ReverseSDE(sde, score_fn, probability_flow=True, lambda_=0.0)
    key, k_prior = jax.random.split(key)
    x = sde.prior_sampling(k_prior, shape)

    def ode_func(t, flat):
      x = flat.reshape(shape)
      vec_t = jnp.full((shape[0],), t)
      drift = rsde.sde(x, vec_t)[0]
      return drift.reshape(-1)

    result = odeint_dopri5(ode_func, x.reshape(-1), sde.T, eps,
                           rtol=rtol, atol=atol)
    x = result.y.reshape(shape)
    if denoise:
      rsde_d = ReverseSDE(sde, score_fn, probability_flow=False, lambda_=1.0)
      vec_eps = jnp.full((shape[0],), sde.eps)
      f, G = rsde_d.discretize(x, vec_eps, jnp.zeros_like(vec_eps))
      x = x - f
    return inverse_scaler(x), result.nfe

  return sampler
