"""Legacy DDPM U-Net in Flax (NHWC). Parity: reference models/ddpm.py:40-181."""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (AttnBlock, DDPMConv, Downsample, ResnetBlockDDPM,
                     Upsample, default_init, get_act, get_timestep_embedding)
from .ncsnpp import get_sigmas
from .registry import register_model

Array = jax.Array


@register_model(name="ddpm")
class DDPM(nn.Module):
  nf: int = 128
  ch_mult: Sequence[int] = (1, 2, 2, 2)
  num_res_blocks: int = 2
  attn_resolutions: Sequence[int] = (16,)
  dropout: float = 0.1
  resamp_with_conv: bool = True
  conditional: bool = True
  image_size: int = 32
  num_channels: int = 3
  nonlinearity: str = "swish"
  scale_by_sigma: bool = False
  sigma_min: float = 0.01
  sigma_max: float = 50.0
  num_scales: int = 1000
  centered: bool = True
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array, labels: Array, train: bool = False) -> Array:
    act = get_act(self.nonlinearity)
    num_resolutions = len(self.ch_mult)
    ResBlock = functools.partial(ResnetBlockDDPM, act=act,
                                 dropout=self.dropout, dtype=self.dtype)

    if self.conditional:
      temb = get_timestep_embedding(labels, self.nf)
      temb = nn.Dense(self.nf * 4, kernel_init=default_init(),
                      bias_init=nn.initializers.zeros, dtype=self.dtype,
                      name="temb_dense0")(temb)
      temb = nn.Dense(self.nf * 4, kernel_init=default_init(),
                      bias_init=nn.initializers.zeros, dtype=self.dtype,
                      name="temb_dense1")(act(temb))
    else:
      temb = None

    h = x if self.centered else 2 * x - 1.0

    hs = [DDPMConv(self.nf, 3, dtype=self.dtype, name="stem")(h)]
    for i_level in range(num_resolutions):
      for i_block in range(self.num_res_blocks):
        h = ResBlock(out_ch=self.nf * self.ch_mult[i_level],
                     name=f"down_{i_level}_{i_block}")(hs[-1], temb,
                                                       train=train)
        if h.shape[2] in self.attn_resolutions:
          h = AttnBlock(dtype=self.dtype,
                        name=f"down_attn_{i_level}_{i_block}")(h)
        hs.append(h)
      if i_level != num_resolutions - 1:
        hs.append(Downsample(with_conv=self.resamp_with_conv,
                             dtype=self.dtype,
                             name=f"down_{i_level}_ds")(hs[-1]))

    h = hs[-1]
    h = ResBlock(name="mid_res0")(h, temb, train=train)
    h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
    h = ResBlock(name="mid_res1")(h, temb, train=train)

    for i_level in reversed(range(num_resolutions)):
      for i_block in range(self.num_res_blocks + 1):
        h = ResBlock(out_ch=self.nf * self.ch_mult[i_level],
                     name=f"up_{i_level}_{i_block}")(
            jnp.concatenate([h, hs.pop()], axis=-1), temb, train=train)
      if h.shape[2] in self.attn_resolutions:
        h = AttnBlock(dtype=self.dtype, name=f"up_attn_{i_level}")(h)
      if i_level != 0:
        h = Upsample(with_conv=self.resamp_with_conv, dtype=self.dtype,
                     name=f"up_{i_level}_us")(h)

    assert not hs
    h = act(nn.GroupNorm(num_groups=32, epsilon=1e-6, name="out_norm")(h))
    h = DDPMConv(self.num_channels, 3, init_scale=0.0, dtype=self.dtype,
                 name="out_conv")(h)

    if self.scale_by_sigma:
      sigmas = jnp.asarray(get_sigmas(self.sigma_min, self.sigma_max,
                                      self.num_scales), dtype=jnp.float32)
      used = sigmas[labels.astype(jnp.int32)]
      h = h / used.reshape((-1,) + (1,) * (h.ndim - 1))
    return h

  @classmethod
  def from_config(cls, config) -> "DDPM":
    m, d = config.model, config.data
    return cls(
        nf=m.nf, ch_mult=tuple(m.ch_mult),
        num_res_blocks=m.num_res_blocks,
        attn_resolutions=tuple(m.attn_resolutions), dropout=m.dropout,
        resamp_with_conv=m.resamp_with_conv, conditional=m.conditional,
        image_size=d.image_size, num_channels=d.num_channels,
        nonlinearity=m.nonlinearity, scale_by_sigma=m.scale_by_sigma,
        sigma_min=m.sigma_min, sigma_max=m.sigma_max,
        num_scales=m.num_scales, centered=d.centered)
