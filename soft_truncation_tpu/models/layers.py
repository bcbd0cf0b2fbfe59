"""Shared Flax building blocks for all score networks (NHWC).

Behavioral parity targets: reference models/layers.py (init schemes,
timestep embedding, NIN/attention, legacy DDPM blocks). Everything here is
channels-last and written for XLA/TPU: convs are `nn.Conv` (lowered to MXU
convolutions), attention is einsum+softmax which XLA fuses, and inits are
the JAX `variance_scaling` family the reference itself ported from JAX
(models/layers.py:54-91).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array
Dtype = Any


def get_act(nonlinearity: str) -> Callable[[Array], Array]:
  """Activation by config name (reference models/layers.py:29-41)."""
  name = nonlinearity.lower()
  if name == "elu":
    return jax.nn.elu
  if name == "relu":
    return jax.nn.relu
  if name == "lrelu":
    return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
  if name == "swish":
    return jax.nn.silu
  raise NotImplementedError(f"activation {nonlinearity} does not exist")


def default_init(scale: float = 1.0):
  """DDPM initializer: variance_scaling(scale, fan_avg, uniform).

  scale == 0 is clamped to 1e-10 (reference models/layers.py:88-91), used
  for "zero-init" output layers.
  """
  scale = 1e-10 if scale == 0 else scale
  return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def ncsn_init(scale: float = 1.0):
  """NCSNv1/v2-style init: torch default (kaiming-uniform-ish) times scale.

  Reference models/layers.py:44-51 multiplies torch's default conv init by
  ``init_scale``; torch's default is kaiming_uniform(a=sqrt(5)) which for
  fan_in f gives U(-1/sqrt(f), 1/sqrt(f)) — i.e. variance_scaling
  (scale^2/3, fan_in, uniform).
  """
  scale = 1e-10 if scale == 0 else scale
  return nn.initializers.variance_scaling(scale ** 2 / 3.0, "fan_in",
                                          "uniform")


def _uniform_bias_like_torch_conv(fan_in: int, scale: float = 1.0):
  """torch conv/linear bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
  scale = 1e-10 if scale == 0 else scale

  def init(key, shape, dtype=jnp.float32):
    bound = scale / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)

  return init


def DDPMConv(features: int, kernel_size: int = 3, stride: int = 1,
             init_scale: float = 1.0, use_bias: bool = True,
             padding: Any = "SAME", dtype: Dtype = jnp.float32,
             act_quant: Optional[str] = None,
             name: str | None = None) -> nn.Module:
  """kxk conv with DDPM init: variance-scaled kernel, zero bias.

  Parity: reference models/layers.py:100-124 (ddpm_conv1x1 / ddpm_conv3x3).
  A factory (not a wrapper module) so params sit directly under ``name`` —
  matching the reference checkpoint layout for the torch porter.

  ``act_quant='float8_e4m3'`` (config.tpu.activation_dtype) swaps in
  ops.quant.QConv: same param tree, but the input activation is stored in
  HBM as e4m3 and cotangents take an e5m2 round-trip (byte-diet for the
  HBM-bound train step — ops/quant.py).
  """
  if act_quant:
    from ..ops.quant import SUPPORTED, QConv
    if act_quant not in SUPPORTED:
      raise NotImplementedError(
          f"tpu.activation_dtype={act_quant!r}; supported: {SUPPORTED}")
    return QConv(
        features,
        (kernel_size, kernel_size),
        strides=(stride, stride),
        padding=padding,
        use_bias=use_bias,
        kernel_init=default_init(init_scale),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )
  return nn.Conv(
      features,
      (kernel_size, kernel_size),
      strides=(stride, stride),
      padding=padding,
      use_bias=use_bias,
      kernel_init=default_init(init_scale),
      bias_init=nn.initializers.zeros,
      dtype=dtype,
      name=name,
  )


class NCSNConv(nn.Module):
  """Conv with NCSNv1/v2 init (torch default scaled by init_scale).

  Parity: reference models/layers.py:44-51,108-115.
  """

  features: int
  kernel_size: int = 3
  stride: int = 1
  use_bias: bool = True
  dilation: int = 1
  init_scale: float = 1.0
  padding: Any = "SAME"
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    fan_in = x.shape[-1] * self.kernel_size * self.kernel_size
    return nn.Conv(
        self.features,
        (self.kernel_size, self.kernel_size),
        strides=(self.stride, self.stride),
        padding=self.padding,
        kernel_dilation=(self.dilation, self.dilation),
        use_bias=self.use_bias,
        kernel_init=ncsn_init(self.init_scale),
        bias_init=_uniform_bias_like_torch_conv(fan_in, self.init_scale),
        dtype=self.dtype,
    )(x)


def NIN(features: int, init_scale: float = 0.1,
        dtype: Dtype = jnp.float32, name: str | None = None) -> nn.Dense:
  """1x1 "network-in-network": dense over the channel axis.

  Parity: reference models/layers.py:546-555 (einsum contraction == dense
  on NHWC's last axis; no permutes needed channels-last). Factory, like
  :func:`DDPMConv`, to keep the param tree flat.
  """
  return nn.Dense(
      features,
      kernel_init=default_init(init_scale),
      bias_init=nn.initializers.zeros,
      dtype=dtype,
      name=name,
  )


def get_timestep_embedding(timesteps: Array, embedding_dim: int,
                           max_positions: int = 10000) -> Array:
  """Sinusoidal transformer-style embedding (models/layers.py:515-529)."""
  assert timesteps.ndim == 1
  half_dim = embedding_dim // 2
  emb = math.log(max_positions) / (half_dim - 1)
  emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
  emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
  emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
  if embedding_dim % 2 == 1:
    emb = jnp.pad(emb, ((0, 0), (0, 1)))
  assert emb.shape == (timesteps.shape[0], embedding_dim)
  return emb


def spatial_attention(q: Array, k: Array, v: Array) -> Array:
  """All-pairs spatial self-attention over an NHWC feature map.

  out[b,h,w,:] = sum_{ij} softmax_{ij}(q[b,h,w]·k[b,i,j]/sqrt(C)) v[b,i,j]

  Parity: reference models/layerspp.py:95-99 / models/layers.py:575-579.
  Flattening HW into one axis turns both contractions into plain [B, HW, C]
  batched matmuls that land on the MXU.
  """
  b, h, w, c = q.shape
  q = q.reshape(b, h * w, c)
  k = k.reshape(b, h * w, c)
  v = v.reshape(b, h * w, c)
  logits = jnp.einsum("bqc,bkc->bqk", q, k,
                      preferred_element_type=jnp.float32) * (int(c) ** -0.5)
  weights = jax.nn.softmax(logits, axis=-1)
  out = jnp.einsum("bqk,bkc->bqc", weights.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
  return out.reshape(b, h, w, c).astype(v.dtype)


class AttnBlock(nn.Module):
  """Legacy DDPM attention block (models/layers.py:558-581): GroupNorm(32),
  q/k/v/out NIN, residual without rescale."""

  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    c = x.shape[-1]
    h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
    q = NIN(c, dtype=self.dtype, name="q")(h)
    k = NIN(c, dtype=self.dtype, name="k")(h)
    v = NIN(c, dtype=self.dtype, name="v")(h)
    h = spatial_attention(q, k, v)
    h = NIN(c, init_scale=0.0, dtype=self.dtype, name="out")(h)
    return x + h


class Upsample(nn.Module):
  """Nearest 2x upsample (+ optional conv). models/layers.py:584-596."""

  with_conv: bool = False
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
    if self.with_conv:
      x = DDPMConv(c, 3, dtype=self.dtype, name="conv")(x)
    return x


class Downsample(nn.Module):
  """2x downsample: strided conv with (0,1) pad, or avg-pool.
  models/layers.py:599-616."""

  with_conv: bool = False
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    b, h, w, c = x.shape
    if self.with_conv:
      x = DDPMConv(c, 3, stride=2, padding=((0, 1), (0, 1)),
                   dtype=self.dtype, name="conv")(x)
    else:
      x = nn.avg_pool(x, (2, 2), strides=(2, 2))
    assert x.shape == (b, h // 2, w // 2, c)
    return x


class ResnetBlockDDPM(nn.Module):
  """Legacy DDPM residual block (models/layers.py:619-662)."""

  act: Callable
  out_ch: Optional[int] = None
  conv_shortcut: bool = False
  dropout: float = 0.1
  dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: Array, temb: Optional[Array] = None,
               train: bool = True) -> Array:
    in_ch = x.shape[-1]
    out_ch = self.out_ch or in_ch
    h = self.act(nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm0")(x))
    h = DDPMConv(out_ch, 3, dtype=self.dtype, name="conv0")(h)
    if temb is not None:
      h = h + nn.Dense(out_ch, kernel_init=default_init(),
                       bias_init=nn.initializers.zeros, dtype=self.dtype,
                       name="temb_proj")(self.act(temb))[:, None, None, :]
    h = self.act(nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(h))
    h = nn.Dropout(self.dropout, deterministic=not train)(h)
    h = DDPMConv(out_ch, 3, init_scale=0.0, dtype=self.dtype, name="conv1")(h)
    if in_ch != out_ch:
      if self.conv_shortcut:
        x = DDPMConv(out_ch, 3, dtype=self.dtype, name="shortcut")(x)
      else:
        x = NIN(out_ch, dtype=self.dtype, name="shortcut")(x)
    return x + h
