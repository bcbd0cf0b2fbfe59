"""NCSN++ building blocks (NHWC Flax). Parity: reference models/layerspp.py.

The FIR resampling paths call soft_truncation_tpu.ops (one fused XLA dilated
conv) instead of the reference's CUDA upfirdn2d kernel.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..ops import (conv_downsample_2d, downsample_2d, naive_downsample_2d,
                   naive_upsample_2d, upsample_2d, upsample_conv_2d)
from .dropout import Dropout
from .layers import NIN, DDPMConv, default_init, spatial_attention

Array = jax.Array
Dtype = Any


def _groups(ch: int) -> int:
  return min(ch // 4, 32)


# Fused GroupNorm+SiLU+conv3x3 Pallas kernel (ops/pallas/gn_conv.py) for
# the res-blocks' norm->act->conv sites — removes the normalized-slab HBM
# write+read. FORWARD ONLY (no VJP): applied only when train=False, so
# training numerics are untouched. Off by default pending the in-graph
# A/B (benchmarks/ROOFLINE.md); SOFT_TRUNCATION_PALLAS_GNCONV=1 opts in.
_PALLAS_GN_CONV = os.environ.get("SOFT_TRUNCATION_PALLAS_GNCONV", "0") == "1"
# f32 VMEM budget guard per kernel instance (whole-image blocks)
_GN_CONV_MAX_HWC = 32 * 32 * 512


class _ParamsOnly(nn.Module):
  """Declares params with given names/shapes/inits and returns them —
  used by the fused path to create the SAME param tree (names, shapes,
  inits) as the nn.GroupNorm / nn.Conv module path, so checkpoints are
  interchangeable whichever path traced first."""

  defs: Tuple[Tuple[str, Tuple[int, ...], Callable], ...]

  @nn.compact
  def __call__(self):
    return {name: self.param(name, init, shape)
            for name, shape, init in self.defs}


def _gn_conv_eligible(module, h: Array, out_ch: int, train: bool) -> bool:
  c = h.shape[-1]
  return (_PALLAS_GN_CONV and not train
          and module.act is jax.nn.silu
          and c % 4 == 0 and c % _groups(c) == 0
          and h.shape[1] * h.shape[2] * max(c, out_ch) <= _GN_CONV_MAX_HWC)


def _fused_gn_silu_conv(module, h: Array, out_ch: int, gn_name: str,
                        conv_name: str, init_scale: float = 1.0) -> Array:
  """norm->SiLU->conv3x3 via the fused Pallas kernel, with params
  declared under the exact names the module path uses."""
  from ..ops.pallas.gn_conv import gn_silu_conv3x3, gn_stats
  c = h.shape[-1]
  gn_p = _ParamsOnly(defs=(("scale", (c,), nn.initializers.ones),
                           ("bias", (c,), nn.initializers.zeros)),
                     name=gn_name)()
  conv_p = _ParamsOnly(
      defs=(("kernel", (3, 3, c, out_ch), default_init(init_scale)),
            ("bias", (out_ch,), nn.initializers.zeros)),
      name=conv_name)()
  g = _groups(c)
  mean, rsqrt = gn_stats(h, g, eps=1e-6)
  out = gn_silu_conv3x3(h.astype(module.dtype), mean, rsqrt,
                        gn_p["scale"], gn_p["bias"],
                        conv_p["kernel"].astype(module.dtype),
                        conv_p["bias"].astype(module.dtype), g)
  return _conv_out(out)


def _conv_out(h: Array) -> Array:
  """Tag a conv output for the 'conv_outputs' remat policy: under
  ``jax.checkpoint(policy=save_only_these_names('conv_out'))`` only these
  MXU results are stored for the backward pass; GroupNorm/SiLU chains are
  recomputed in-fusion — trading cheap VPU flops for HBM traffic (the
  measured bottleneck: the train step runs at ~95% of v5e HBM bandwidth).
  A no-op outside remat."""
  return checkpoint_name(h, "conv_out")


class FixedFourierProjection(nn.Module):
  """Fixed sin/cos input features at 128*pi and 256*pi, concatenated on the
  channel axis (+4C channels). Parity: models/layerspp.py:31-43."""

  @nn.compact
  def __call__(self, x: Array) -> Array:
    return jnp.concatenate([
        x,
        jnp.sin(x * 128 * math.pi), jnp.cos(x * 128 * math.pi),
        jnp.sin(x * 256 * math.pi), jnp.cos(x * 256 * math.pi),
    ], axis=-1)


class GaussianFourierProjection(nn.Module):
  """Random-frequency Fourier embedding of (log) noise levels.

  Parity: models/layerspp.py:45-54: W ~ N(0, scale^2), frozen
  (requires_grad=False in the reference). Here W is a param wrapped in
  stop_gradient: Adam sees identically-zero gradients so it never moves,
  and the value ports cleanly through checkpoints and parity tests.
  """

  embedding_size: int = 256
  scale: float = 1.0

  @nn.compact
  def __call__(self, x: Array) -> Array:
    w = self.param("W", nn.initializers.normal(stddev=self.scale),
                   (self.embedding_size,))
    w = jax.lax.stop_gradient(w)  # frozen, like requires_grad=False
    x_proj = x[:, None] * w[None, :] * 2 * math.pi
    return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class Combine(nn.Module):
  """Merge a progressive-input pyramid branch: 1x1-conv x then cat/sum with y.
  Parity: models/layerspp.py:57-72."""

  method: str = "cat"
  dtype: Dtype = jnp.float32
  norm_dtype: Dtype = jnp.float32
  act_quant: Optional[str] = None

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    h = DDPMConv(y.shape[-1], 1, dtype=self.dtype,
                 act_quant=self.act_quant, name="conv")(x)
    if self.method == "cat":
      return jnp.concatenate([h, y], axis=-1)
    if self.method == "sum":
      return h + y
    raise ValueError(f"combine method {self.method} not recognized")


class AttnBlockpp(nn.Module):
  """Self-attention block with optional skip rescale.
  Parity: models/layerspp.py:75-104."""

  skip_rescale: bool = False
  init_scale: float = 0.0
  dtype: Dtype = jnp.float32
  norm_dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    c = x.shape[-1]
    h = nn.GroupNorm(num_groups=_groups(c), epsilon=1e-6, dtype=self.norm_dtype, name="norm")(x)
    q = NIN(c, dtype=self.dtype, name="q")(h)
    k = NIN(c, dtype=self.dtype, name="k")(h)
    v = NIN(c, dtype=self.dtype, name="v")(h)
    h = spatial_attention(q, k, v)
    h = NIN(c, init_scale=self.init_scale, dtype=self.dtype, name="out")(h)
    if self.skip_rescale:
      return (x + h) / math.sqrt(2.0)
    return x + h


class ConvResample(nn.Module):
  """Conv fused with FIR up/down-sampling (StyleGAN2 Conv2d).
  Parity: models/up_or_down_sampling.py:23-56 (weight default_init'd when
  the reference passes kernel_init=default_init(); bias zeros)."""

  features: int
  kernel: int = 3
  up: bool = False
  down: bool = False
  fir_kernel: Sequence[float] = (1, 3, 3, 1)
  use_bias: bool = True
  dtype: Dtype = jnp.float32
  norm_dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    assert not (self.up and self.down)
    assert self.kernel >= 1 and self.kernel % 2 == 1
    in_ch = x.shape[-1]
    w = self.param("kernel", default_init(),
                   (self.kernel, self.kernel, in_ch, self.features))
    w = w.astype(self.dtype)
    if self.up:
      x = upsample_conv_2d(x, w, k=tuple(self.fir_kernel))
    elif self.down:
      x = conv_downsample_2d(x, w, k=tuple(self.fir_kernel))
    else:
      dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                          ("NHWC", "HWIO", "NHWC"))
      x = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                       dimension_numbers=dn)
    if self.use_bias:
      b = self.param("bias", nn.initializers.zeros, (self.features,))
      x = x + b.astype(self.dtype)
    return x


class Upsample(nn.Module):
  """2x upsample: nearest (+conv) or FIR (+fused conv).
  Parity: models/layerspp.py:107-139."""

  out_ch: Optional[int] = None
  with_conv: bool = False
  fir: bool = False
  fir_kernel: Sequence[float] = (1, 3, 3, 1)
  dtype: Dtype = jnp.float32
  norm_dtype: Dtype = jnp.float32
  act_quant: Optional[str] = None

  @nn.compact
  def __call__(self, x: Array) -> Array:
    b, h, w, c = x.shape
    out_ch = self.out_ch or c
    if not self.fir:
      x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
      if self.with_conv:
        x = DDPMConv(out_ch, 3, dtype=self.dtype,
                     act_quant=self.act_quant, name="conv")(x)
    else:
      if not self.with_conv:
        x = upsample_2d(x, k=tuple(self.fir_kernel), factor=2)
      else:
        x = ConvResample(out_ch, 3, up=True, fir_kernel=self.fir_kernel,
                         dtype=self.dtype, name="conv")(x)
    return x


class Downsample(nn.Module):
  """2x downsample: avg-pool / strided conv or FIR (+fused conv).
  Parity: models/layerspp.py:142-176."""

  out_ch: Optional[int] = None
  with_conv: bool = False
  fir: bool = False
  fir_kernel: Sequence[float] = (1, 3, 3, 1)
  dtype: Dtype = jnp.float32
  norm_dtype: Dtype = jnp.float32
  act_quant: Optional[str] = None

  @nn.compact
  def __call__(self, x: Array) -> Array:
    c = x.shape[-1]
    out_ch = self.out_ch or c
    if not self.fir:
      if self.with_conv:
        x = DDPMConv(out_ch, 3, stride=2, padding=((0, 1), (0, 1)),
                     dtype=self.dtype, act_quant=self.act_quant,
                     name="conv")(x)
      else:
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
    else:
      if not self.with_conv:
        x = downsample_2d(x, k=tuple(self.fir_kernel), factor=2)
      else:
        x = ConvResample(out_ch, 3, down=True, fir_kernel=self.fir_kernel,
                         dtype=self.dtype, name="conv")(x)
    return x


class ResnetBlockDDPMpp(nn.Module):
  """DDPM-style residual block with skip rescale.
  Parity: models/layerspp.py:179-222."""

  act: Callable
  out_ch: Optional[int] = None
  conv_shortcut: bool = False
  dropout: float = 0.1
  dropout_bits: int = 32
  skip_rescale: bool = False
  init_scale: float = 0.0
  dtype: Dtype = jnp.float32
  norm_dtype: Dtype = jnp.float32
  act_quant: Optional[str] = None

  @nn.compact
  def __call__(self, x: Array, temb: Optional[Array] = None,
               train: bool = True) -> Array:
    in_ch = x.shape[-1]
    out_ch = self.out_ch or in_ch
    if _gn_conv_eligible(self, x, out_ch, train):
      h = _fused_gn_silu_conv(self, x, out_ch, "norm0", "conv0")
    else:
      h = self.act(nn.GroupNorm(num_groups=_groups(in_ch), epsilon=1e-6,
                                dtype=self.norm_dtype, name="norm0")(x))
      h = _conv_out(DDPMConv(out_ch, 3, dtype=self.dtype,
                             act_quant=self.act_quant, name="conv0")(h))
    if temb is not None:
      h = h + nn.Dense(out_ch, kernel_init=default_init(),
                       bias_init=nn.initializers.zeros, dtype=self.dtype,
                       name="temb_proj")(self.act(temb))[:, None, None, :]
    if _gn_conv_eligible(self, h, out_ch, train):
      h = _fused_gn_silu_conv(self, h, out_ch, "norm1", "conv1",
                              init_scale=self.init_scale)
    else:
      h = self.act(nn.GroupNorm(num_groups=_groups(out_ch), epsilon=1e-6,
                                dtype=self.norm_dtype, name="norm1")(h))
      h = Dropout(self.dropout, deterministic=not train,
                  bits=self.dropout_bits)(h)
      h = _conv_out(DDPMConv(out_ch, 3, init_scale=self.init_scale,
                               dtype=self.dtype,
                               act_quant=self.act_quant, name="conv1")(h))
    if in_ch != out_ch:
      if self.conv_shortcut:
        x = _conv_out(DDPMConv(out_ch, 3, dtype=self.dtype,
                               act_quant=self.act_quant, name="shortcut")(x))
      else:
        x = NIN(out_ch, dtype=self.dtype, name="shortcut")(x)
    if self.skip_rescale:
      return (x + h) / math.sqrt(2.0)
    return x + h


class ResnetBlockBigGANpp(nn.Module):
  """BigGAN-style residual block with in-block FIR up/down-sampling.
  Parity: models/layerspp.py:225-287."""

  act: Callable
  out_ch: Optional[int] = None
  up: bool = False
  down: bool = False
  dropout: float = 0.1
  dropout_bits: int = 32
  fir: bool = False
  fir_kernel: Sequence[float] = (1, 3, 3, 1)
  skip_rescale: bool = True
  init_scale: float = 0.0
  dtype: Dtype = jnp.float32
  norm_dtype: Dtype = jnp.float32
  act_quant: Optional[str] = None

  @nn.compact
  def __call__(self, x: Array, temb: Optional[Array] = None,
               train: bool = True) -> Array:
    in_ch = x.shape[-1]
    out_ch = self.out_ch or in_ch
    # fused norm0->SiLU->conv0 only when no resampling sits between them
    fuse0 = (not self.up and not self.down
             and _gn_conv_eligible(self, x, out_ch, train))
    if fuse0:
      h = _fused_gn_silu_conv(self, x, out_ch, "norm0", "conv0")
    else:
      h = self.act(nn.GroupNorm(num_groups=_groups(in_ch), epsilon=1e-6,
                                dtype=self.norm_dtype, name="norm0")(x))

    if self.up:
      if self.fir:
        h = upsample_2d(h, k=tuple(self.fir_kernel), factor=2)
        x = upsample_2d(x, k=tuple(self.fir_kernel), factor=2)
      else:
        h = naive_upsample_2d(h, factor=2)
        x = naive_upsample_2d(x, factor=2)
    elif self.down:
      if self.fir:
        h = downsample_2d(h, k=tuple(self.fir_kernel), factor=2)
        x = downsample_2d(x, k=tuple(self.fir_kernel), factor=2)
      else:
        h = naive_downsample_2d(h, factor=2)
        x = naive_downsample_2d(x, factor=2)

    if not fuse0:
      h = _conv_out(DDPMConv(out_ch, 3, dtype=self.dtype,
                             act_quant=self.act_quant, name="conv0")(h))
    if temb is not None:
      h = h + nn.Dense(out_ch, kernel_init=default_init(),
                       bias_init=nn.initializers.zeros, dtype=self.dtype,
                       name="temb_proj")(self.act(temb))[:, None, None, :]
    # fused norm1->SiLU->conv1: dropout is inactive in the train=False
    # regime the fused path is gated to, so the chain is contiguous
    if _gn_conv_eligible(self, h, out_ch, train):
      h = _fused_gn_silu_conv(self, h, out_ch, "norm1", "conv1",
                              init_scale=self.init_scale)
    else:
      h = self.act(nn.GroupNorm(num_groups=_groups(out_ch), epsilon=1e-6,
                                dtype=self.norm_dtype, name="norm1")(h))
      h = Dropout(self.dropout, deterministic=not train,
                  bits=self.dropout_bits)(h)
      h = _conv_out(DDPMConv(out_ch, 3, init_scale=self.init_scale,
                               dtype=self.dtype,
                               act_quant=self.act_quant, name="conv1")(h))

    if in_ch != out_ch or self.up or self.down:
      x = _conv_out(DDPMConv(out_ch, 1, dtype=self.dtype,
                             act_quant=self.act_quant, name="shortcut")(x))

    if self.skip_rescale:
      return (x + h) / math.sqrt(2.0)
    return x + h
