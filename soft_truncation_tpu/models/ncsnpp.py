"""NCSN++ / DDPM++ / UNCSN++ U-Net in Flax (NHWC).

Structural parity with reference models/ncsnpp.py:35-433, config knob for
knob: fir, progressive(_input), auxiliary_resblock, embedding_type,
fourier_feature, skip_rescale, scale_by_sigma, lsgm/embedding_dim,
progressive_combine, resamp_with_conv, attention.

The reference threads a flat ModuleList with a running index
(models/ncsnpp.py:258-427); here the same dataflow is written as a
straight-line compact Flax module — identical math, names instead of
indices.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import layerspp
from .layers import DDPMConv, default_init, get_act, get_timestep_embedding
from .registry import register_model

Array = jax.Array


def get_sigmas(sigma_min: float, sigma_max: float, num_scales: int) -> np.ndarray:
  """Descending geometric noise grid (reference models/utils.py:51-61)."""
  return np.exp(np.linspace(np.log(sigma_max), np.log(sigma_min), num_scales))


@register_model(name="ncsnpp")
class NCSNpp(nn.Module):
  """Config-driven NCSN++ family U-Net."""

  # architecture
  nf: int = 128
  ch_mult: Sequence[int] = (1, 2, 2, 2)
  num_res_blocks: int = 4
  attn_resolutions: Sequence[int] = (16,)
  attention: bool = True
  dropout: float = 0.1
  # random-bit budget per dropout-mask element (models/dropout.py):
  # 32 = exact flax/nn.Dropout parity; 16/8 = packed threefry bits (2x/4x
  # fewer hashes — attacks the measured ~25% reproducible-PRNG step tax)
  dropout_bits: int = 32
  resamp_with_conv: bool = True
  image_size: int = 32
  num_channels: int = 3
  conditional: bool = True
  fir: bool = False
  fir_kernel: Sequence[float] = (1, 3, 3, 1)
  skip_rescale: bool = True
  resblock_type: str = "biggan"  # 'ddpm' | 'biggan'
  auxiliary_resblock: bool = True
  progressive: str = "none"  # 'none' | 'output_skip' | 'residual'
  progressive_input: str = "none"  # 'none' | 'input_skip' | 'residual'
  progressive_combine: str = "sum"  # 'cat' | 'sum'
  embedding_type: str = "fourier"  # 'fourier' | 'positional'
  fourier_scale: float = 16.0
  fourier_feature: bool = False
  init_scale: float = 0.0
  nonlinearity: str = "swish"
  scale_by_sigma: bool = False
  lsgm: bool = False
  embedding_dim: int = 128
  # noise grid for positional embeddings / scale_by_sigma
  sigma_min: float = 0.01
  sigma_max: float = 50.0
  num_scales: int = 1000
  # data convention: if not centered, inputs in [0,1] are mapped to [-1,1]
  centered: bool = True
  dtype: Any = jnp.float32
  # rematerialize residual blocks (activation checkpointing) — needed to
  # fit the 1024^2 FFHQ config on one chip (SURVEY.md "hard parts")
  remat: bool = False
  # 'full': recompute everything in backward (min memory);
  # 'conv_outputs': store only MXU (conv/shortcut) results and recompute
  # the GroupNorm/SiLU chains — targets HBM traffic, the measured train
  # bottleneck (bench.py: 95% of v5e HBM bandwidth), at minimal reflops
  remat_policy: str = "full"
  # GroupNorm compute dtype: f32 by default (scale/bias params are f32 so
  # flax promotes); bf16 trades ~0 quality margin for ~9%% step time
  norm_dtype: Any = jnp.float32
  # activation-byte diet (ops/quant.py): 'float8_e4m3' stores conv input
  # activations in HBM as e4m3 (1 byte/elt) with e5m2 backward cotangent
  # round-trips — the step is HBM-bound (ROOFLINE.md), so this attacks
  # the dominant byte term directly. None = off (reference f32 semantics).
  act_quant: Optional[str] = None

  @nn.compact
  def __call__(self, x: Array, time_cond: Array, train: bool = False) -> Array:
    act = get_act(self.nonlinearity)
    assert self.progressive in ("none", "output_skip", "residual")
    assert self.progressive_input in ("none", "input_skip", "residual")
    assert self.embedding_type in ("fourier", "positional")
    num_resolutions = len(self.ch_mult)

    block_cls = (layerspp.ResnetBlockDDPMpp if self.resblock_type == "ddpm"
                 else layerspp.ResnetBlockBigGANpp)
    if self.remat:
      # static_argnums: 0=self, 1=x, 2=temb, 3=train
      policy = None
      if self.remat_policy == "conv_outputs":
        policy = jax.checkpoint_policies.save_only_these_names("conv_out")
      block_cls = nn.remat(block_cls, static_argnums=(3,), policy=policy)
    ResnetBlock = (
        functools.partial(block_cls, act=act,
                          dropout=self.dropout,
                          dropout_bits=self.dropout_bits,
                          init_scale=self.init_scale,
                          skip_rescale=self.skip_rescale, dtype=self.dtype,
                          norm_dtype=self.norm_dtype,
                          act_quant=self.act_quant)
        if self.resblock_type == "ddpm" else
        functools.partial(block_cls, act=act,
                          dropout=self.dropout,
                          dropout_bits=self.dropout_bits, fir=self.fir,
                          fir_kernel=self.fir_kernel,
                          init_scale=self.init_scale,
                          skip_rescale=self.skip_rescale, dtype=self.dtype,
                          norm_dtype=self.norm_dtype,
                          act_quant=self.act_quant))
    AttnBlock = functools.partial(layerspp.AttnBlockpp,
                                  init_scale=self.init_scale,
                                  skip_rescale=self.skip_rescale,
                                  dtype=self.dtype,
                                  norm_dtype=self.norm_dtype)

    # ---- time embedding (models/ncsnpp.py:258-294) ----------------------
    if self.embedding_type == "fourier":
      used_sigmas = time_cond
      temb = layerspp.GaussianFourierProjection(
          embedding_size=self.nf, scale=self.fourier_scale,
          name="fourier_emb")(jnp.log(used_sigmas))
      cond_dim = self.nf * 4
    else:
      timesteps = time_cond
      sigmas = jnp.asarray(get_sigmas(self.sigma_min, self.sigma_max,
                                      self.num_scales), dtype=jnp.float32)
      used_sigmas = sigmas[time_cond.astype(jnp.int32)]
      embed_dim = self.embedding_dim if self.lsgm else self.nf
      temb = get_timestep_embedding(timesteps, embed_dim)
      cond_dim = embed_dim * 4

    if self.conditional:
      temb = nn.Dense(cond_dim, kernel_init=default_init(),
                      bias_init=nn.initializers.zeros, dtype=self.dtype,
                      name="temb_dense0")(temb)
      temb = nn.Dense(cond_dim, kernel_init=default_init(),
                      bias_init=nn.initializers.zeros, dtype=self.dtype,
                      name="temb_dense1")(act(temb))
    else:
      temb = None

    if not self.centered:
      x = 2 * x - 1.0  # inputs in [0,1] -> [-1,1] (models/ncsnpp.py:296-298)

    # ---- input stem ------------------------------------------------------
    input_pyramid = x if self.progressive_input != "none" else None
    if self.fourier_feature:
      x = layerspp.FixedFourierProjection(name="fixed_fourier")(x)
    h = DDPMConv(self.nf, 3, dtype=self.dtype, act_quant=self.act_quant,
                 name="stem")(x)
    hs = [h]

    # ---- down path (models/ncsnpp.py:312-347) ---------------------------
    for i_level in range(num_resolutions):
      for i_block in range(self.num_res_blocks):
        h = ResnetBlock(out_ch=self.nf * self.ch_mult[i_level],
                        name=f"down_{i_level}_{i_block}")(hs[-1], temb,
                                                          train)
        if h.shape[2] in self.attn_resolutions and self.attention:
          h = AttnBlock(name=f"down_attn_{i_level}_{i_block}")(h)
        hs.append(h)

      if i_level != num_resolutions - 1:
        if self.resblock_type == "ddpm":
          h = layerspp.Downsample(with_conv=self.resamp_with_conv,
                                  fir=self.fir, fir_kernel=self.fir_kernel,
                                  dtype=self.dtype,
                                  name=f"down_{i_level}_ds")(hs[-1])
        elif self.auxiliary_resblock:
          h = ResnetBlock(down=True,
                          name=f"down_{i_level}_ds")(hs[-1], temb,
                                                     train)

        if self.progressive_input == "input_skip":
          input_pyramid = layerspp.Downsample(
              fir=self.fir, fir_kernel=self.fir_kernel, with_conv=False,
              dtype=self.dtype, name=f"pyr_ds_{i_level}")(input_pyramid)
          h = layerspp.Combine(method=self.progressive_combine,
                               dtype=self.dtype,
                               name=f"combine_{i_level}")(input_pyramid, h)
        elif self.progressive_input == "residual":
          input_pyramid = layerspp.Downsample(
              out_ch=h.shape[-1], with_conv=True, fir=self.fir,
              fir_kernel=self.fir_kernel, dtype=self.dtype,
              name=f"pyr_ds_{i_level}")(input_pyramid)
          if self.skip_rescale:
            input_pyramid = (input_pyramid + h) / math.sqrt(2.0)
          else:
            input_pyramid = input_pyramid + h
          h = input_pyramid

        if self.auxiliary_resblock:
          hs.append(h)

    # ---- bottleneck (models/ncsnpp.py:349-357) --------------------------
    h = hs[-1]
    if not self.auxiliary_resblock:
      hs.pop()
    h = ResnetBlock(name="mid_res0")(h, temb, train)
    h = AttnBlock(name="mid_attn")(h)
    h = ResnetBlock(name="mid_res1")(h, temb, train)

    # ---- up path (models/ncsnpp.py:359-417) ------------------------------
    pyramid = None
    num_res_up = (self.num_res_blocks + 1 if self.auxiliary_resblock
                  else self.num_res_blocks)
    for i_level in reversed(range(num_resolutions)):
      for i_block in range(num_res_up):
        h = ResnetBlock(out_ch=self.nf * self.ch_mult[i_level],
                        name=f"up_{i_level}_{i_block}")(
            jnp.concatenate([h, hs.pop()], axis=-1), temb, train)

      if h.shape[2] in self.attn_resolutions and self.attention:
        h = AttnBlock(name=f"up_attn_{i_level}")(h)

      if self.progressive != "none":
        if i_level == num_resolutions - 1:
          gn = nn.GroupNorm(num_groups=min(h.shape[-1] // 4, 32),
                            epsilon=1e-6, name=f"pyr_norm_{i_level}")
          if self.progressive == "output_skip":
            pyramid = DDPMConv(self.num_channels, 3,
                               init_scale=self.init_scale, dtype=self.dtype,
                               act_quant=self.act_quant,
                               name=f"pyr_conv_{i_level}")(act(gn(h)))
          else:  # residual
            pyramid = DDPMConv(h.shape[-1], 3, dtype=self.dtype,
                               act_quant=self.act_quant,
                               name=f"pyr_conv_{i_level}")(act(gn(h)))
        else:
          if self.progressive == "output_skip":
            pyramid = layerspp.Upsample(
                fir=self.fir, fir_kernel=self.fir_kernel, with_conv=False,
                dtype=self.dtype, name=f"pyr_us_{i_level}")(pyramid)
            gn = nn.GroupNorm(num_groups=min(h.shape[-1] // 4, 32),
                              epsilon=1e-6, name=f"pyr_norm_{i_level}")
            pyramid_h = DDPMConv(self.num_channels, 3,
                                 init_scale=self.init_scale,
                                 dtype=self.dtype,
                                 act_quant=self.act_quant,
                                 name=f"pyr_conv_{i_level}")(act(gn(h)))
            pyramid = pyramid + pyramid_h
          else:  # residual
            pyramid = layerspp.Upsample(
                out_ch=h.shape[-1], with_conv=True, fir=self.fir,
                fir_kernel=self.fir_kernel, dtype=self.dtype,
                name=f"pyr_us_{i_level}")(pyramid)
            if self.skip_rescale:
              pyramid = (pyramid + h) / math.sqrt(2.0)
            else:
              pyramid = pyramid + h
            h = pyramid

      if i_level != 0:
        if self.resblock_type == "ddpm":
          h = layerspp.Upsample(with_conv=self.resamp_with_conv,
                                fir=self.fir, fir_kernel=self.fir_kernel,
                                dtype=self.dtype,
                                name=f"up_{i_level}_us")(h)
        elif self.auxiliary_resblock:
          h = ResnetBlock(up=True, name=f"up_{i_level}_us")(h, temb,
                                                            train)

    assert not hs

    # ---- output head (models/ncsnpp.py:419-430) --------------------------
    if self.progressive == "output_skip":
      h = pyramid
    else:
      h = act(nn.GroupNorm(num_groups=min(h.shape[-1] // 4, 32),
                           epsilon=1e-6, name="out_norm")(h))
      h = DDPMConv(self.num_channels, 3, init_scale=self.init_scale,
                   dtype=self.dtype, act_quant=self.act_quant,
                   name="out_conv")(h)

    if self.scale_by_sigma:
      h = h / used_sigmas.reshape((x.shape[0],) + (1,) * (h.ndim - 1))

    return h

  @classmethod
  def from_config(cls, config) -> "NCSNpp":
    """Build from an ml_collections config with the reference schema.

    ``config.tpu.compute_dtype = 'bfloat16'`` puts every conv/dense on the
    MXU in bf16 (params stay f32; GroupNorm statistics auto-promote to f32
    because the scale/bias params are f32).
    """
    m, d = config.model, config.data
    tpu_cfg = config.get("tpu")
    dtype = jnp.bfloat16 if (
        tpu_cfg is not None
        and tpu_cfg.get("compute_dtype", "float32") == "bfloat16"
    ) else jnp.float32
    remat = bool(tpu_cfg.get("remat", False)) if tpu_cfg is not None else False
    remat_policy = (tpu_cfg.get("remat_policy", "full")
                    if tpu_cfg is not None else "full")
    norm_dtype = jnp.bfloat16 if (
        tpu_cfg is not None
        and tpu_cfg.get("norm_dtype", "float32") == "bfloat16"
    ) else jnp.float32
    act_quant = (tpu_cfg.get("activation_dtype", "") or None
                 if tpu_cfg is not None else None)
    raw_bits = (tpu_cfg.get("dropout_bits", 32)
                if tpu_cfg is not None else 32)
    if raw_bits in (0, "auto"):  # 0 = auto (configs/base.py)
      # Packed masks (bits=8) only pay off where the PRNG hashes
      # per-element (threefry); under rbg/unsafe_rbg the unpack adds HBM
      # traffic for nothing (measured pairs: configs/base.py, the
      # dropout_bits comment). Resolve against the LIVE impl — run_lib /
      # bench tools set jax_default_prng_impl before building the model.
      impl = str(jax.config.jax_default_prng_impl)
      dropout_bits = 8 if "threefry" in impl else 32
    else:
      dropout_bits = int(raw_bits)
    return cls(
        dtype=dtype,
        remat=remat,
        remat_policy=remat_policy,
        norm_dtype=norm_dtype,
        act_quant=act_quant,
        dropout_bits=dropout_bits,
        nf=m.nf,
        ch_mult=tuple(m.ch_mult),
        num_res_blocks=m.num_res_blocks,
        attn_resolutions=tuple(m.attn_resolutions),
        attention=m.get("attention", True),
        dropout=m.dropout,
        resamp_with_conv=m.resamp_with_conv,
        image_size=d.image_size,
        num_channels=d.num_channels,
        conditional=m.conditional,
        fir=m.fir,
        fir_kernel=tuple(m.fir_kernel),
        skip_rescale=m.skip_rescale,
        resblock_type=m.resblock_type.lower(),
        auxiliary_resblock=m.get("auxiliary_resblock", True),
        progressive=m.progressive.lower(),
        progressive_input=m.progressive_input.lower(),
        progressive_combine=m.progressive_combine.lower(),
        embedding_type=m.embedding_type.lower(),
        fourier_scale=m.get("fourier_scale", 16.0),
        fourier_feature=m.get("fourier_feature", False),
        init_scale=m.init_scale,
        nonlinearity=m.nonlinearity,
        scale_by_sigma=m.scale_by_sigma,
        lsgm=m.get("lsgm", False),
        embedding_dim=m.get("embedding_dim", 128),
        sigma_min=m.sigma_min,
        sigma_max=m.sigma_max,
        num_scales=m.num_scales,
        centered=d.centered,
    )
