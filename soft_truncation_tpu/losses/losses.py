"""Training losses and the optimizer stack.

Parity target: reference losses.py. Everything is a pure function of
(params, batch, PRNG key, t_min); the gradient/accumulation/EMA plumbing
lives in soft_truncation_tpu.train.step (one jitted XLA program), not here.

Weighting branches (reference losses.py:122-132):
  importance_sampling: 0.5 * Z * reduce(|score*std + z|^2)   (IS-reweighted)
  likelihood_weighting: 0.5 * Z * reduce(|score + z/std|^2) * g(t)^2
  default:              0.5 * Z * reduce(|score*std + z|^2)  (Z=1 uniform)
plus the optional reconstruction (truncation-boundary decoder) term
(losses.py:134-164).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.score import get_score_fn
from ..sde.core import SDE, VESDE, VPSDE, batch_mul

Array = jax.Array


# ---------------------------------------------------------------------------
# Optimizer (reference losses.py:29-58)
# ---------------------------------------------------------------------------


def lr_schedule(config) -> optax.Schedule:
  """Linear warmup to optim.lr over optim.warmup steps, then constant."""
  lr = config.optim.lr
  warmup = config.optim.warmup

  def schedule(step):
    if warmup <= 0:
      return lr
    return lr * jnp.minimum(step / warmup, 1.0)

  return schedule


def get_optimizer(config) -> optax.GradientTransformation:
  """Adam/AdamW with grad clipping + warmup, as one optax chain.

  Matches reference semantics: clip on raw grads (losses.py:54-55), warmup
  rescales the lr (losses.py:51-53), Adam b2=0.999 / AdamW b2=0.99
  (losses.py:32-36). Numerically pinned against the torch stack in
  tests/test_optimizer_parity.py. One documented deviation: torch Adam
  applies weight decay as COUPLED L2 (into the grad before the moments);
  here it is decoupled — irrelevant in practice since every released
  config sets optim.weight_decay = 0.
  """
  name = config.optim.optimizer
  # HBM byte diet: the Adam first moment may be stored in bf16
  # (config.tpu.adam_mu_dtype) — optax keeps the update math in f32. The
  # second moment stays f32: its 1e-3-relative increments are below bf16
  # resolution (2^-8) and would freeze.
  mu_dtype = (config.tpu.get("adam_mu_dtype", "float32")
              if "tpu" in config else "float32")
  mu_dtype = None if mu_dtype in ("float32", None, "") else mu_dtype
  chain = []
  if config.optim.grad_clip >= 0:
    chain.append(optax.clip_by_global_norm(config.optim.grad_clip))
  if name == "Adam":
    if config.optim.get("amsgrad", False):
      chain.append(optax.scale_by_amsgrad(b1=config.optim.beta1, b2=0.999,
                                          eps=config.optim.eps,
                                          mu_dtype=mu_dtype))
    else:
      chain.append(optax.scale_by_adam(b1=config.optim.beta1, b2=0.999,
                                       eps=config.optim.eps,
                                       mu_dtype=mu_dtype))
    if config.optim.weight_decay:
      chain.append(optax.add_decayed_weights(config.optim.weight_decay))
  elif name == "AdamW":
    chain.append(optax.scale_by_adam(b1=config.optim.beta1, b2=0.99,
                                     eps=config.optim.eps,
                                     mu_dtype=mu_dtype))
    chain.append(optax.add_decayed_weights(config.optim.weight_decay))
  else:
    raise NotImplementedError(f"Optimizer {name} not supported yet!")
  chain.append(optax.scale_by_learning_rate(lr_schedule(config)))
  return optax.chain(*chain)


# ---------------------------------------------------------------------------
# Discretized Gaussian decoder (reference losses.py:79-99)
# ---------------------------------------------------------------------------


def _approx_standard_normal_cdf(x):
  return 0.5 * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi)
                               * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x: Array, means: Array,
                                        log_scales: Array) -> Array:
  """log P(x | N(means, exp(log_scales))) for 8-bit data scaled to [-1, 1]."""
  assert x.shape == means.shape
  centered = x - means
  inv_stdv = jnp.exp(-log_scales)
  cdf_plus = _approx_standard_normal_cdf(inv_stdv * (centered + 1.0 / 255.0))
  cdf_min = _approx_standard_normal_cdf(inv_stdv * (centered - 1.0 / 255.0))
  log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
  log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
  cdf_delta = cdf_plus - cdf_min
  log_probs = jnp.where(
      x < -0.999, log_cdf_plus,
      jnp.where(x > 0.999, log_one_minus_cdf_min,
                jnp.log(jnp.maximum(cdf_delta, 1e-12))))
  assert log_probs.shape == x.shape
  return log_probs


# ---------------------------------------------------------------------------
# Continuous score-matching loss (reference losses.py:61-168)
# ---------------------------------------------------------------------------


def get_sde_loss_fn(config, sde: SDE, train: bool,
                    variance: str = "scoreflow") -> Callable:
  """Returns loss_fn(params, batch, key, t_min, importance_sampling, rngs)
  -> per-example losses [B]."""
  reduce_mean = config.training.reduce_mean
  likelihood_weighting = config.training.likelihood_weighting
  reconstruction_loss = config.training.reconstruction_loss
  dequantization = config.data.dequantization

  def reduce_op(x):
    return jnp.mean(x, axis=-1) if reduce_mean else 0.5 * jnp.sum(x, axis=-1)

  def loss_fn(params, model, batch: Array, key: Array, t_min,
              importance_sampling: bool, rngs=None) -> Array:
    k_t, k_z, k_rz = jax.random.split(key, 3)
    b = batch.shape[0]
    t, Z = sde.sample_diffusion_time(k_t, b, t_min,
                                     importance_sampling=importance_sampling)

    score_fn = get_score_fn(config, sde, model, params, train=train,
                            continuous=config.training.continuous, rngs=rngs)
    z = jax.random.normal(k_z, batch.shape)
    mean, std = sde.marginal_prob(batch, t)
    perturbed = mean + batch_mul(std, z)
    score = score_fn(perturbed, t)

    if importance_sampling:
      sq = jnp.square(batch_mul(std, score) + z)
      losses = 0.5 * Z * reduce_op(sq.reshape(b, -1))
    elif likelihood_weighting:
      g2 = sde.sde(jnp.zeros_like(batch), t)[1] ** 2
      sq = jnp.square(score + batch_mul(1.0 / std, z))
      losses = 0.5 * Z * reduce_op(sq.reshape(b, -1)) * g2
    else:
      sq = jnp.square(batch_mul(std, score) + z)
      losses = 0.5 * Z * reduce_op(sq.reshape(b, -1))

    if reconstruction_loss:
      eps_vec = jnp.full((b,), t_min)
      r_mean, r_std = sde.marginal_prob(batch, eps_vec)
      rz = jax.random.normal(k_rz, batch.shape)
      r_perturbed = r_mean + batch_mul(r_std, rz)
      r_score = score_fn(r_perturbed, eps_vec)

      alpha, beta = sde.marginal_prob(jnp.ones_like(batch), eps_vec)
      q_mean = r_perturbed / alpha + batch_mul(beta ** 2, r_score) / alpha
      if variance == "ddpm":
        q_std = beta
      elif variance == "scoreflow":
        q_std = beta / jnp.mean(alpha, axis=(1, 2, 3))
      else:
        raise ValueError(variance)

      n_dim = math.prod(batch.shape[1:])
      if dequantization == "lossless":
        decoder_nll = -discretized_gaussian_log_likelihood(
            batch, means=q_mean,
            log_scales=jnp.log(q_std).reshape(b, 1, 1, 1))
        recon = decoder_nll.sum(axis=(1, 2, 3))
      else:
        p_entropy = n_dim / 2.0 * (math.log(2 * math.pi)
                                   + 2 * jnp.log(r_std) + 1.0)
        q_recon = (n_dim / 2.0 * (math.log(2 * math.pi) + 2 * jnp.log(q_std))
                   + 0.5 / (q_std ** 2)
                   * jnp.square(batch - q_mean).sum(axis=(1, 2, 3)))
        recon = q_recon - p_entropy
      if reduce_mean:
        recon = recon / n_dim
      losses = losses + recon

    return losses

  return loss_fn


# ---------------------------------------------------------------------------
# Legacy discrete losses (reference losses.py:171-215)
# ---------------------------------------------------------------------------


def get_smld_loss_fn(config, vesde: VESDE, train: bool) -> Callable:
  """Discrete SMLD/NCSN loss; sigmas indexed ascending-by-noise
  (descending grid flipped, losses.py:171-192)."""
  assert isinstance(vesde, VESDE), "SMLD training only works for VESDEs."
  reduce_mean = config.training.reduce_mean

  def reduce_op(x):
    return jnp.mean(x, axis=-1) if reduce_mean else 0.5 * jnp.sum(x, axis=-1)

  def loss_fn(params, model, batch, key, rngs=None):
    k_label, k_noise = jax.random.split(key)
    b = batch.shape[0]
    smld_sigmas = jnp.flip(vesde.discrete_sigmas())  # descending
    labels = jax.random.randint(k_label, (b,), 0, vesde.N)
    sigmas = smld_sigmas[labels]
    noise = batch_mul(sigmas, jax.random.normal(k_noise, batch.shape))
    perturbed = batch + noise
    if train:
      score = model.apply({"params": params}, perturbed, labels, train=True,
                          rngs=rngs or {})
    else:
      score = model.apply({"params": params}, perturbed, labels, train=False)
    target = -batch_mul(1.0 / sigmas ** 2, noise)
    sq = jnp.square(score - target)
    losses = reduce_op(sq.reshape(b, -1)) * sigmas ** 2
    return losses

  return loss_fn


def get_ddpm_loss_fn(config, vpsde: VPSDE, train: bool) -> Callable:
  """Discrete DDPM loss (losses.py:195-215)."""
  assert isinstance(vpsde, VPSDE), "DDPM training only works for VPSDEs."
  reduce_mean = config.training.reduce_mean

  def reduce_op(x):
    return jnp.mean(x, axis=-1) if reduce_mean else 0.5 * jnp.sum(x, axis=-1)

  def loss_fn(params, model, batch, key, rngs=None):
    k_label, k_noise = jax.random.split(key)
    b = batch.shape[0]
    labels = jax.random.randint(k_label, (b,), 0, vpsde.N)
    sqrt_ac = vpsde.sqrt_alphas_cumprod()
    sqrt_1m = vpsde.sqrt_1m_alphas_cumprod()
    noise = jax.random.normal(k_noise, batch.shape)
    perturbed = (batch_mul(sqrt_ac[labels], batch)
                 + batch_mul(sqrt_1m[labels], noise))
    if train:
      score = model.apply({"params": params}, perturbed, labels, train=True,
                          rngs=rngs or {})
    else:
      score = model.apply({"params": params}, perturbed, labels, train=False)
    sq = jnp.square(score - noise)
    return reduce_op(sq.reshape(b, -1))

  return loss_fn
