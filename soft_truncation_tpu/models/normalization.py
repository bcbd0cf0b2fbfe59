"""Normalization zoo (NHWC Flax). Parity: reference models/normalization.py.

torch semantics reproduced: InstanceNorm eps=1e-5 biased variance;
InstanceNorm++ channel-mean statistics use the UNBIASED variance (torch.var
default, reference models/normalization.py:173,203); affine inits are
N(1, 0.02) scales and zero biases.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _normal_init(mean: float, std: float):
  def init(key, shape, dtype=jnp.float32):
    return mean + std * jax.random.normal(key, shape, dtype)
  return init


def instance_norm_2d(x: Array, eps: float = 1e-5) -> Array:
  """Per-sample, per-channel spatial normalization (no affine), NHWC."""
  mean = jnp.mean(x, axis=(1, 2), keepdims=True)
  var = jnp.var(x, axis=(1, 2), keepdims=True)
  return (x - mean) / jnp.sqrt(var + eps)


class InstanceNorm2d(nn.Module):
  """nn.InstanceNorm2d(affine=False) equivalent."""

  @nn.compact
  def __call__(self, x: Array) -> Array:
    return instance_norm_2d(x)


class NoneNorm2d(nn.Module):
  @nn.compact
  def __call__(self, x: Array) -> Array:
    return x


class VarianceNorm2d(nn.Module):
  """x / sqrt(spatial var) * alpha (models/normalization.py:110-123)."""

  @nn.compact
  def __call__(self, x: Array) -> Array:
    c = x.shape[-1]
    alpha = self.param("alpha", _normal_init(1.0, 0.02), (c,))
    # torch.var(dim=(2,3)) default unbiased=True
    n = x.shape[1] * x.shape[2]
    var = jnp.var(x, axis=(1, 2), keepdims=True) * n / max(n - 1, 1)
    h = x / jnp.sqrt(var + 1e-5)
    return alpha * h


class InstanceNorm2dPlus(nn.Module):
  """InstanceNorm++ (models/normalization.py:157-183): instance norm plus a
  re-injected, channel-normalized spatial mean."""

  bias: bool = True

  @nn.compact
  def __call__(self, x: Array) -> Array:
    c = x.shape[-1]
    alpha = self.param("alpha", _normal_init(1.0, 0.02), (c,))
    gamma = self.param("gamma", _normal_init(1.0, 0.02), (c,))
    means = jnp.mean(x, axis=(1, 2))  # [B, C]
    m = jnp.mean(means, axis=-1, keepdims=True)
    v = jnp.var(means, axis=-1, keepdims=True) * c / max(c - 1, 1)  # unbiased
    means = (means - m) / jnp.sqrt(v + 1e-5)
    h = instance_norm_2d(x)
    h = h + means[:, None, None, :] * alpha
    if self.bias:
      beta = self.param("beta", nn.initializers.zeros, (c,))
      return gamma * h + beta
    return gamma * h


def _class_gamma_beta(num_classes: int, c: int, y: Array):
  """Per-class (gamma, beta) lookup shared by the conditional norms:
  uniform[0,1) gamma, zero beta (reference models/normalization.py:50-54,
  75-79, 133-137). Returns [B,1,1,C]-broadcastable pairs. Must be called
  from inside an ``nn.compact`` method (creates the ``embed`` submodule)."""
  def init(key, shape, dtype=jnp.float32):
    return jnp.concatenate([
        jax.random.uniform(key, (shape[0], c), dtype),
        jnp.zeros((shape[0], c), dtype)], -1)
  emb = nn.Embed(num_classes, 2 * c, embedding_init=init, name="embed")(y)
  gamma, beta = jnp.split(emb, 2, axis=-1)
  return gamma[:, None, None, :], beta[:, None, None, :]


def _class_gamma(num_classes: int, c: int, y: Array) -> Array:
  """Per-class gamma-only lookup (the bias=False branches), uniform[0,1)."""
  emb = nn.Embed(num_classes, c, embedding_init=nn.initializers.uniform(1.0),
                 name="embed")(y)
  return emb[:, None, None, :]


class ConditionalInstanceNorm2dPlus(nn.Module):
  """models/normalization.py:186-215: class-conditional InstanceNorm++."""

  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    c = x.shape[-1]
    means = jnp.mean(x, axis=(1, 2))
    m = jnp.mean(means, axis=-1, keepdims=True)
    v = jnp.var(means, axis=-1, keepdims=True) * c / max(c - 1, 1)
    means = (means - m) / jnp.sqrt(v + 1e-5)
    h = instance_norm_2d(x)

    if self.bias:
      def init(key, shape, dtype=jnp.float32):
        scales = 1.0 + 0.02 * jax.random.normal(
            key, (shape[0], 2 * c), dtype)
        return jnp.concatenate([scales, jnp.zeros((shape[0], c), dtype)], -1)
      emb = nn.Embed(self.num_classes, 3 * c, embedding_init=init,
                     name="embed")(y)
      gamma, alpha, beta = jnp.split(emb, 3, axis=-1)
      h = h + means[:, None, None, :] * alpha[:, None, None, :]
      return gamma[:, None, None, :] * h + beta[:, None, None, :]
    emb = nn.Embed(self.num_classes, 2 * c,
                   embedding_init=_normal_init(1.0, 0.02), name="embed")(y)
    gamma, alpha = jnp.split(emb, 2, axis=-1)
    h = h + means[:, None, None, :] * alpha[:, None, None, :]
    return gamma[:, None, None, :] * h


class _BatchNorm2dTorch(nn.Module):
  """``torch.nn.BatchNorm2d(affine=False)`` running-stats semantics.

  Flax's ``nn.BatchNorm`` accumulates the BIASED batch variance into the
  running variance; torch normalizes by the biased variance in train mode
  but accumulates the UNBIASED (n/(n-1)) variance into ``running_var``
  (torch _BatchNorm.forward), so train-then-eval outputs differ. torch's
  default momentum is 0.1: running = (1-0.1)*running + 0.1*batch."""

  momentum: float = 0.1
  epsilon: float = 1e-5

  @nn.compact
  def __call__(self, x: Array, train: bool = True) -> Array:
    c = x.shape[-1]
    ra_mean = self.variable("batch_stats", "mean",
                            lambda: jnp.zeros((c,), jnp.float32))
    ra_var = self.variable("batch_stats", "var",
                           lambda: jnp.ones((c,), jnp.float32))
    if train:
      n = x.shape[0] * x.shape[1] * x.shape[2]
      mean = jnp.mean(x, axis=(0, 1, 2))
      var = jnp.var(x, axis=(0, 1, 2))  # biased: normalizes the batch
      if not self.is_initializing():
        unbiased = var * n / max(n - 1, 1)
        m = self.momentum
        ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
        ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
    else:
      mean, var = ra_mean.value, ra_var.value
    return (x - mean) / jnp.sqrt(var + self.epsilon)


class ConditionalBatchNorm2d(nn.Module):
  """models/normalization.py:43-66. Dead code in the reference — its
  ``get_normalization`` conditional branch only resolves InstanceNorm++
  (models/normalization.py:25-29) — implemented for inventory
  completeness. Batch statistics ride Flax's ``batch_stats`` collection;
  ``train=True`` normalizes by the batch like torch train mode,
  ``train=False`` uses the running stats (unbiased-variance accumulation,
  torch semantics — see _BatchNorm2dTorch)."""

  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x: Array, y: Array, train: bool = True) -> Array:
    c = x.shape[-1]
    h = _BatchNorm2dTorch(name="bn")(x, train=train)
    if self.bias:
      gamma, beta = _class_gamma_beta(self.num_classes, c, y)
      return gamma * h + beta
    return _class_gamma(self.num_classes, c, y) * h


class ConditionalInstanceNorm2d(nn.Module):
  """models/normalization.py:68-90."""

  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    c = x.shape[-1]
    h = instance_norm_2d(x)
    if self.bias:
      gamma, beta = _class_gamma_beta(self.num_classes, c, y)
      return gamma * h + beta
    return _class_gamma(self.num_classes, c, y) * h


class ConditionalVarianceNorm2d(nn.Module):
  """models/normalization.py:93-107."""

  num_classes: int
  bias: bool = False

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    c = x.shape[-1]
    n = x.shape[1] * x.shape[2]
    var = jnp.var(x, axis=(1, 2), keepdims=True) * n / max(n - 1, 1)
    h = x / jnp.sqrt(var + 1e-5)
    gamma = nn.Embed(self.num_classes, c,
                     embedding_init=_normal_init(1.0, 0.02),
                     name="embed")(y)
    return gamma[:, None, None, :] * h


class ConditionalNoneNorm2d(nn.Module):
  """models/normalization.py:126-146 (affine only, no normalization)."""

  num_classes: int
  bias: bool = True

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    c = x.shape[-1]
    if self.bias:
      gamma, beta = _class_gamma_beta(self.num_classes, c, y)
      return gamma * x + beta
    return _class_gamma(self.num_classes, c, y) * x


def get_normalization(config, conditional: bool = False):
  """Resolve the normalization module class (models/normalization.py:22-40)."""
  norm = config.model.normalization
  if conditional:
    if norm == "InstanceNorm++":
      return functools.partial(ConditionalInstanceNorm2dPlus,
                               num_classes=config.model.num_classes)
    raise NotImplementedError(f"{norm} not implemented yet.")
  if norm == "InstanceNorm":
    return InstanceNorm2d
  if norm == "InstanceNorm++":
    return InstanceNorm2dPlus
  if norm == "VarianceNorm":
    return VarianceNorm2d
  if norm == "GroupNorm":
    return functools.partial(nn.GroupNorm, num_groups=32)
  raise ValueError(f"Unknown normalization: {norm}")
