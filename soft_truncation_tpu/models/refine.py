"""RefineNet-style blocks for the legacy NCSNv1/v2 family (NHWC Flax).

Parity: reference models/layers.py:133-507 (CRP/RCU/MSF/Refine blocks,
ConvMeanPool/MeanPoolConv/UpsampleConv, (Conditional)ResidualBlock).

TPU notes: align-corners bilinear resize (torch F.interpolate
align_corners=True, models/layers.py:248) has no jax.image equivalent, so
it is expressed as two small interpolation matmuls (MXU-friendly and
exactly matching corner-aligned sampling).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import NCSNConv

Array = jax.Array


def _align_corners_matrix(out_size: int, in_size: int) -> np.ndarray:
  """Row-stochastic linear-interp matrix with corner-aligned sampling."""
  m = np.zeros((out_size, in_size), dtype=np.float32)
  if out_size == 1 or in_size == 1:
    m[:, 0] = 1.0
    return m
  scale = (in_size - 1) / (out_size - 1)
  for i in range(out_size):
    pos = i * scale
    lo = int(np.floor(pos))
    hi = min(lo + 1, in_size - 1)
    frac = pos - lo
    m[i, lo] += 1.0 - frac
    m[i, hi] += frac
  return m


def bilinear_align_corners(x: Array, shape: Tuple[int, int]) -> Array:
  """F.interpolate(..., mode='bilinear', align_corners=True) on NHWC."""
  b, h, w, c = x.shape
  oh, ow = shape
  if (oh, ow) == (h, w):
    return x
  mh = jnp.asarray(_align_corners_matrix(oh, h))
  mw = jnp.asarray(_align_corners_matrix(ow, w))
  x = jnp.einsum("Oh,bhwc->bOwc", mh, x)
  return jnp.einsum("Ow,bhwc->bhOc", mw, x)


def _pool5(x: Array, kind: str) -> Array:
  """5x5 stride-1 same-size pool (models/layers.py:141-143)."""
  if kind == "max":
    return nn.max_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))
  return nn.avg_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))


class CRPBlock(nn.Module):
  """Chained residual pooling (models/layers.py:133-154)."""

  features: int
  n_stages: int
  act: Callable
  maxpool: bool = True

  @nn.compact
  def __call__(self, x: Array) -> Array:
    x = self.act(x)
    path = x
    for i in range(self.n_stages):
      path = _pool5(path, "max" if self.maxpool else "avg")
      path = NCSNConv(self.features, 3, use_bias=False,
                      name=f"conv_{i}")(path)
      x = path + x
    return x


class CondCRPBlock(nn.Module):
  """models/layers.py:157-180 (always avg-pool)."""

  features: int
  n_stages: int
  num_classes: int
  normalizer: Callable
  act: Callable

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    x = self.act(x)
    path = x
    for i in range(self.n_stages):
      path = self.normalizer(bias=True, name=f"norm_{i}")(path, y)
      path = _pool5(path, "avg")
      path = NCSNConv(self.features, 3, use_bias=False,
                      name=f"conv_{i}")(path)
      x = path + x
    return x


class RCUBlock(nn.Module):
  """Residual conv unit (models/layers.py:183-204)."""

  features: int
  n_blocks: int
  n_stages: int
  act: Callable

  @nn.compact
  def __call__(self, x: Array) -> Array:
    for i in range(self.n_blocks):
      residual = x
      for j in range(self.n_stages):
        x = self.act(x)
        x = NCSNConv(self.features, 3, use_bias=False,
                     name=f"conv_{i}_{j}")(x)
      x = x + residual
    return x


class CondRCUBlock(nn.Module):
  """models/layers.py:207-231."""

  features: int
  n_blocks: int
  n_stages: int
  num_classes: int
  normalizer: Callable
  act: Callable

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    for i in range(self.n_blocks):
      residual = x
      for j in range(self.n_stages):
        x = self.normalizer(bias=True, name=f"norm_{i}_{j}")(x, y)
        x = self.act(x)
        x = NCSNConv(self.features, 3, use_bias=False,
                     name=f"conv_{i}_{j}")(x)
      x = x + residual
    return x


class MSFBlock(nn.Module):
  """Multi-scale fusion: conv each input, corner-aligned bilinear resize to
  target shape, sum (models/layers.py:234-250)."""

  features: int

  @nn.compact
  def __call__(self, xs: Sequence[Array], shape: Tuple[int, int]) -> Array:
    total = None
    for i, x in enumerate(xs):
      h = NCSNConv(self.features, 3, use_bias=True, name=f"conv_{i}")(x)
      h = bilinear_align_corners(h, shape)
      total = h if total is None else total + h
    return total


class CondMSFBlock(nn.Module):
  """models/layers.py:253-274."""

  features: int
  num_classes: int
  normalizer: Callable

  @nn.compact
  def __call__(self, xs: Sequence[Array], y: Array,
               shape: Tuple[int, int]) -> Array:
    total = None
    for i, x in enumerate(xs):
      h = self.normalizer(bias=True, name=f"norm_{i}")(x, y)
      h = NCSNConv(self.features, 3, use_bias=True, name=f"conv_{i}")(h)
      h = bilinear_align_corners(h, shape)
      total = h if total is None else total + h
    return total


class RefineBlock(nn.Module):
  """RefineNet block (models/layers.py:277-310)."""

  features: int
  act: Callable
  start: bool = False
  end: bool = False
  maxpool: bool = True

  @nn.compact
  def __call__(self, xs: Sequence[Array], shape: Tuple[int, int]) -> Array:
    hs = []
    for i, x in enumerate(xs):
      hs.append(RCUBlock(x.shape[-1], 2, 2, self.act,
                         name=f"adapt_{i}")(x))
    if len(xs) > 1:
      h = MSFBlock(self.features, name="msf")(hs, shape)
    else:
      h = hs[0]
    h = CRPBlock(self.features, 2, self.act, maxpool=self.maxpool,
                 name="crp")(h)
    return RCUBlock(self.features, 3 if self.end else 1, 2, self.act,
                    name="output")(h)


class CondRefineBlock(nn.Module):
  """models/layers.py:313-348."""

  features: int
  num_classes: int
  normalizer: Callable
  act: Callable
  start: bool = False
  end: bool = False

  @nn.compact
  def __call__(self, xs: Sequence[Array], y: Array,
               shape: Tuple[int, int]) -> Array:
    hs = []
    for i, x in enumerate(xs):
      hs.append(CondRCUBlock(x.shape[-1], 2, 2, self.num_classes,
                             self.normalizer, self.act,
                             name=f"adapt_{i}")(x, y))
    if len(xs) > 1:
      h = CondMSFBlock(self.features, self.num_classes, self.normalizer,
                       name="msf")(hs, y, shape)
    else:
      h = hs[0]
    h = CondCRPBlock(self.features, 2, self.num_classes, self.normalizer,
                     self.act, name="crp")(h, y)
    return CondRCUBlock(self.features, 3 if self.end else 1, 2,
                        self.num_classes, self.normalizer, self.act,
                        name="output")(h, y)


def _mean_pool_2x(x: Array) -> Array:
  """Average of the four 2x2-phase subsamples (models/layers.py:367-369)."""
  return (x[:, ::2, ::2, :] + x[:, 1::2, ::2, :] + x[:, ::2, 1::2, :]
          + x[:, 1::2, 1::2, :]) / 4.0


class ConvMeanPool(nn.Module):
  """conv then 2x mean-pool (models/layers.py:351-369)."""

  features: int
  kernel_size: int = 3
  use_bias: bool = True
  adjust_padding: bool = False

  @nn.compact
  def __call__(self, x: Array) -> Array:
    if self.adjust_padding:
      x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
    x = NCSNConv(self.features, self.kernel_size, use_bias=self.use_bias,
                 name="conv")(x)
    return _mean_pool_2x(x)


class MeanPoolConv(nn.Module):
  """2x mean-pool then conv (models/layers.py:372-381)."""

  features: int
  kernel_size: int = 3
  use_bias: bool = True

  @nn.compact
  def __call__(self, x: Array) -> Array:
    return NCSNConv(self.features, self.kernel_size, use_bias=self.use_bias,
                    name="conv")(_mean_pool_2x(x))


class UpsampleConv(nn.Module):
  """Duplicate channels 4x, pixel-shuffle 2x, conv (models/layers.py:384-394).

  torch PixelShuffle with a 4x channel concat of identical copies places
  input channel ((4c + 2*di + dj) mod C) at output phase (di, dj) of output
  channel c — reproduced exactly with channel gathers.
  """

  features: int
  kernel_size: int = 3
  use_bias: bool = True

  @nn.compact
  def __call__(self, x: Array) -> Array:
    b, h, w, c = x.shape
    out = jnp.zeros((b, 2 * h, 2 * w, c), dtype=x.dtype)
    for di in range(2):
      for dj in range(2):
        src = (4 * jnp.arange(c) + 2 * di + dj) % c
        out = out.at[:, di::2, dj::2, :].set(jnp.take(x, src, axis=-1))
    return NCSNConv(self.features, self.kernel_size, use_bias=self.use_bias,
                    name="conv")(out)


class ResidualBlock(nn.Module):
  """NCSNv2 residual block (models/layers.py:453-507)."""

  features: int
  act: Callable
  normalization: Callable  # class taking no args besides name
  resample: Optional[str] = None  # None | 'down'
  adjust_padding: bool = False
  dilation: int = 1

  @nn.compact
  def __call__(self, x: Array) -> Array:
    in_ch = x.shape[-1]
    out = self.normalization(name="norm1")(x)
    out = self.act(out)
    if self.resample == "down":
      if self.dilation > 1:
        out = NCSNConv(in_ch, 3, dilation=self.dilation, name="conv1")(out)
        out = self.normalization(name="norm2")(out)
        out = self.act(out)
        out = NCSNConv(self.features, 3, dilation=self.dilation,
                       name="conv2")(out)
        shortcut = NCSNConv(self.features, 3, dilation=self.dilation,
                            name="shortcut")(x)
      else:
        out = NCSNConv(in_ch, 3, name="conv1")(out)
        out = self.normalization(name="norm2")(out)
        out = self.act(out)
        out = ConvMeanPool(self.features, 3,
                           adjust_padding=self.adjust_padding,
                           name="conv2")(out)
        shortcut = ConvMeanPool(self.features, 1,
                                adjust_padding=self.adjust_padding,
                                name="shortcut")(x)
    elif self.resample is None:
      out = NCSNConv(self.features, 3, dilation=self.dilation,
                     name="conv1")(out)
      out = self.normalization(name="norm2")(out)
      out = self.act(out)
      out = NCSNConv(self.features, 3, dilation=self.dilation,
                     name="conv2")(out)
      if self.features == in_ch:
        shortcut = x
      elif self.dilation > 1:
        shortcut = NCSNConv(self.features, 3, dilation=self.dilation,
                            name="shortcut")(x)
      else:
        shortcut = NCSNConv(self.features, 1, name="shortcut")(x)
    else:
      raise ValueError("invalid resample value")
    return shortcut + out


class ConditionalResidualBlock(nn.Module):
  """Class-conditional NCSNv1 residual block (models/layers.py:397-450)."""

  features: int
  num_classes: int
  act: Callable
  normalization: Callable  # class taking (bias=..., name=...) and (x, y)
  resample: Optional[str] = None
  adjust_padding: bool = False
  dilation: int = 1

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    in_ch = x.shape[-1]
    out = self.normalization(name="norm1")(x, y)
    out = self.act(out)
    if self.resample == "down":
      if self.dilation > 1:
        out = NCSNConv(in_ch, 3, dilation=self.dilation, name="conv1")(out)
        out = self.normalization(name="norm2")(out, y)
        out = self.act(out)
        out = NCSNConv(self.features, 3, dilation=self.dilation,
                       name="conv2")(out)
        shortcut = NCSNConv(self.features, 3, dilation=self.dilation,
                            name="shortcut")(x)
      else:
        out = NCSNConv(in_ch, 3, name="conv1")(out)
        out = self.normalization(name="norm2")(out, y)
        out = self.act(out)
        out = ConvMeanPool(self.features, 3,
                           adjust_padding=self.adjust_padding,
                           name="conv2")(out)
        shortcut = ConvMeanPool(self.features, 1,
                                adjust_padding=self.adjust_padding,
                                name="shortcut")(x)
    elif self.resample is None:
      out = NCSNConv(self.features, 3, dilation=self.dilation,
                     name="conv1")(out)
      out = self.normalization(name="norm2")(out, y)
      out = self.act(out)
      out = NCSNConv(self.features, 3, dilation=self.dilation,
                     name="conv2")(out)
      if self.features == in_ch:
        shortcut = x
      elif self.dilation > 1:
        shortcut = NCSNConv(self.features, 3, dilation=self.dilation,
                            name="shortcut")(x)
      else:
        shortcut = nn.Conv(self.features, (1, 1), name="shortcut")(x)
    else:
      raise ValueError("invalid resample value")
    return shortcut + out
