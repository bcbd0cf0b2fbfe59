"""Legacy NCSNv1/v2 RefineNet decoders (NHWC Flax).

Parity: reference models/ncsnv2.py (ncsnv2_64 / ncsn / ncsnv2_128 /
ncsnv2_256 registrations). Kept for completeness of the model zoo; no
Soft-Truncation config instantiates them.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import NCSNConv, get_act
from .ncsnpp import get_sigmas
from .normalization import (ConditionalInstanceNorm2dPlus, InstanceNorm2dPlus,
                            get_normalization)
from .refine import (CondRefineBlock, ConditionalResidualBlock, RefineBlock,
                     ResidualBlock)
from .registry import register_model

Array = jax.Array


class _NCSNv2Base(nn.Module):
  """Shared scaffolding for the unconditional v2 variants."""

  nf: int = 128
  image_size: int = 32
  num_channels: int = 3
  nonlinearity: str = "elu"
  normalization: str = "InstanceNorm++"
  sigma_min: float = 0.01
  sigma_max: float = 50.0
  num_scales: int = 1000
  centered: bool = False

  def _norm(self):
    if self.normalization == "InstanceNorm++":
      return InstanceNorm2dPlus
    raise NotImplementedError(self.normalization)

  def _scale_output(self, out: Array, y: Array, x: Array) -> Array:
    sigmas = jnp.asarray(get_sigmas(self.sigma_min, self.sigma_max,
                                    self.num_scales), dtype=jnp.float32)
    used = sigmas[y.astype(jnp.int32)]
    return out / used.reshape((x.shape[0],) + (1,) * (out.ndim - 1))

  @classmethod
  def from_config(cls, config):
    m, d = config.model, config.data
    return cls(
        nf=m.nf, image_size=d.image_size,
        num_channels=d.get("channels", d.get("num_channels", 3)),
        nonlinearity=m.nonlinearity, normalization=m.normalization,
        sigma_min=m.sigma_min, sigma_max=m.sigma_max,
        num_scales=m.num_scales, centered=d.centered)


@register_model(name="ncsnv2_64")
class NCSNv2(_NCSNv2Base):
  """models/ncsnv2.py:43-132 (images < 96px)."""

  @nn.compact
  def __call__(self, x: Array, y: Array, train: bool = False) -> Array:
    act = get_act(self.nonlinearity)
    norm = self._norm()
    nf = self.nf
    h = x if self.centered else 2 * x - 1.0

    out = NCSNConv(nf, 3, name="begin_conv")(h)
    Res = functools.partial(ResidualBlock, act=act, normalization=norm)

    l1 = Res(nf, name="res1_0")(out)
    l1 = Res(nf, name="res1_1")(l1)
    l2 = Res(2 * nf, resample="down", name="res2_0")(l1)
    l2 = Res(2 * nf, name="res2_1")(l2)
    l3 = Res(2 * nf, resample="down", dilation=2, name="res3_0")(l2)
    l3 = Res(2 * nf, dilation=2, name="res3_1")(l3)
    adj = self.image_size == 28
    l4 = Res(2 * nf, resample="down", dilation=4, adjust_padding=adj,
             name="res4_0")(l3)
    l4 = Res(2 * nf, dilation=4, name="res4_1")(l4)

    r1 = RefineBlock(2 * nf, act, start=True, name="refine1")(
        [l4], l4.shape[1:3])
    r2 = RefineBlock(2 * nf, act, name="refine2")([l3, r1], l3.shape[1:3])
    r3 = RefineBlock(nf, act, name="refine3")([l2, r2], l2.shape[1:3])
    out = RefineBlock(nf, act, end=True, name="refine4")(
        [l1, r3], l1.shape[1:3])

    out = norm(name="normalizer")(out)
    out = act(out)
    out = NCSNConv(self.num_channels, 3, name="end_conv")(out)
    return self._scale_output(out, y, x)


@register_model(name="ncsn")
class NCSN(nn.Module):
  """Class-conditional NCSNv1 (models/ncsnv2.py:135-218)."""

  nf: int = 128
  image_size: int = 32
  num_channels: int = 3
  nonlinearity: str = "elu"
  num_scales: int = 1000
  centered: bool = False

  @nn.compact
  def __call__(self, x: Array, y: Array, train: bool = False) -> Array:
    act = get_act(self.nonlinearity)
    nf = self.nf
    y = y.astype(jnp.int32)
    norm = functools.partial(ConditionalInstanceNorm2dPlus,
                             num_classes=self.num_scales)
    h = x if self.centered else 2 * x - 1.0

    out = NCSNConv(nf, 3, name="begin_conv")(h)
    Res = functools.partial(ConditionalResidualBlock, act=act,
                            normalization=norm, num_classes=self.num_scales)

    l1 = Res(nf, name="res1_0")(out, y)
    l1 = Res(nf, name="res1_1")(l1, y)
    l2 = Res(2 * nf, resample="down", name="res2_0")(l1, y)
    l2 = Res(2 * nf, name="res2_1")(l2, y)
    l3 = Res(2 * nf, resample="down", dilation=2, name="res3_0")(l2, y)
    l3 = Res(2 * nf, dilation=2, name="res3_1")(l3, y)
    adj = self.image_size == 28
    l4 = Res(2 * nf, resample="down", dilation=4, adjust_padding=adj,
             name="res4_0")(l3, y)
    l4 = Res(2 * nf, dilation=4, name="res4_1")(l4, y)

    Ref = functools.partial(CondRefineBlock, num_classes=self.num_scales,
                            normalizer=norm, act=act)
    r1 = Ref(2 * nf, start=True, name="refine1")([l4], y, l4.shape[1:3])
    r2 = Ref(2 * nf, name="refine2")([l3, r1], y, l3.shape[1:3])
    r3 = Ref(nf, name="refine3")([l2, r2], y, l2.shape[1:3])
    out = Ref(nf, end=True, name="refine4")([l1, r3], y, l1.shape[1:3])

    out = norm(name="normalizer")(out, y)
    out = act(out)
    return NCSNConv(self.num_channels, 3, name="end_conv")(out)

  @classmethod
  def from_config(cls, config):
    m, d = config.model, config.data
    return cls(nf=m.nf, image_size=d.image_size,
               num_channels=d.get("channels", d.get("num_channels", 3)),
               nonlinearity=m.nonlinearity, num_scales=m.num_scales,
               centered=d.centered)


@register_model(name="ncsnv2_128")
class NCSNv2_128(_NCSNv2Base):
  """models/ncsnv2.py:221-312 (96-128px)."""

  @nn.compact
  def __call__(self, x: Array, y: Array, train: bool = False) -> Array:
    act = get_act(self.nonlinearity)
    norm = self._norm()
    nf = self.nf
    h = x if self.centered else 2 * x - 1.0

    out = NCSNConv(nf, 3, name="begin_conv")(h)
    Res = functools.partial(ResidualBlock, act=act, normalization=norm)

    l1 = Res(nf, name="res1_0")(out)
    l1 = Res(nf, name="res1_1")(l1)
    l2 = Res(2 * nf, resample="down", name="res2_0")(l1)
    l2 = Res(2 * nf, name="res2_1")(l2)
    l3 = Res(2 * nf, resample="down", name="res3_0")(l2)
    l3 = Res(2 * nf, name="res3_1")(l3)
    l4 = Res(4 * nf, resample="down", dilation=2, name="res4_0")(l3)
    l4 = Res(4 * nf, dilation=2, name="res4_1")(l4)
    l5 = Res(4 * nf, resample="down", dilation=4, name="res5_0")(l4)
    l5 = Res(4 * nf, dilation=4, name="res5_1")(l5)

    r1 = RefineBlock(4 * nf, act, start=True, name="refine1")(
        [l5], l5.shape[1:3])
    r2 = RefineBlock(2 * nf, act, name="refine2")([l4, r1], l4.shape[1:3])
    r3 = RefineBlock(2 * nf, act, name="refine3")([l3, r2], l3.shape[1:3])
    r4 = RefineBlock(nf, act, name="refine4")([l2, r3], l2.shape[1:3])
    out = RefineBlock(nf, act, end=True, name="refine5")(
        [l1, r4], l1.shape[1:3])

    out = norm(name="normalizer")(out)
    out = act(out)
    out = NCSNConv(self.num_channels, 3, name="end_conv")(out)
    return self._scale_output(out, y, x)


@register_model(name="ncsnv2_256")
class NCSNv2_256(_NCSNv2Base):
  """models/ncsnv2.py:315-416 (129-256px)."""

  @nn.compact
  def __call__(self, x: Array, y: Array, train: bool = False) -> Array:
    act = get_act(self.nonlinearity)
    norm = self._norm()
    nf = self.nf
    h = x if self.centered else 2 * x - 1.0

    out = NCSNConv(nf, 3, name="begin_conv")(h)
    Res = functools.partial(ResidualBlock, act=act, normalization=norm)

    l1 = Res(nf, name="res1_0")(out)
    l1 = Res(nf, name="res1_1")(l1)
    l2 = Res(2 * nf, resample="down", name="res2_0")(l1)
    l2 = Res(2 * nf, name="res2_1")(l2)
    l3 = Res(2 * nf, resample="down", name="res3_0")(l2)
    l3 = Res(2 * nf, name="res3_1")(l3)
    l31 = Res(2 * nf, resample="down", name="res31_0")(l3)
    l31 = Res(2 * nf, name="res31_1")(l31)
    l4 = Res(4 * nf, resample="down", dilation=2, name="res4_0")(l31)
    l4 = Res(4 * nf, dilation=2, name="res4_1")(l4)
    l5 = Res(4 * nf, resample="down", dilation=4, name="res5_0")(l4)
    l5 = Res(4 * nf, dilation=4, name="res5_1")(l5)

    r1 = RefineBlock(4 * nf, act, start=True, name="refine1")(
        [l5], l5.shape[1:3])
    r2 = RefineBlock(2 * nf, act, name="refine2")([l4, r1], l4.shape[1:3])
    r31 = RefineBlock(2 * nf, act, name="refine31")([l31, r2], l31.shape[1:3])
    r3 = RefineBlock(2 * nf, act, name="refine3")([l3, r31], l3.shape[1:3])
    r4 = RefineBlock(nf, act, name="refine4")([l2, r3], l2.shape[1:3])
    out = RefineBlock(nf, act, end=True, name="refine5")(
        [l1, r4], l1.shape[1:3])

    out = norm(name="normalizer")(out)
    out = act(out)
    out = NCSNConv(self.num_channels, 3, name="end_conv")(out)
    return self._scale_output(out, y, x)


def get_network(config):
  """Pick the v2 variant by resolution (models/ncsnv2.py:31-40)."""
  size = config.data.image_size
  if size < 96:
    return NCSNv2.from_config(config)
  if 96 <= size <= 128:
    return NCSNv2_128.from_config(config)
  if 128 < size <= 256:
    return NCSNv2_256.from_config(config)
  raise NotImplementedError(
      f"No network suitable for {size}px implemented yet.")
