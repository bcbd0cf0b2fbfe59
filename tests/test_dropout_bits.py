"""Packed-bits dropout (models/dropout.py): parity at bits=32, unbiased
statistics and determinism at bits=16/8, sharding invariance of the
packed draw, and the NCSN++ plumbing (config.tpu.dropout_bits)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_truncation_tpu.models.dropout import Dropout

SHAPE = (4, 8, 8, 16)  # channels divisible by 4 (the packed path)


def _apply(module, x, seed=0):
  return module.apply({}, x, rngs={"dropout": jax.random.PRNGKey(seed)})


def test_bits32_bit_identical_to_flax_dropout():
  """bits=32 must be EXACTLY flax.linen.Dropout — same rng stream, same
  mask, same scaling — so the default path cannot drift from parity."""
  x = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
  ours = _apply(Dropout(0.3, deterministic=False, bits=32), x)
  flax_ = nn.Dropout(0.3, deterministic=False).apply(
      {}, x, rngs={"dropout": jax.random.PRNGKey(0)})
  np.testing.assert_array_equal(np.asarray(ours), np.asarray(flax_))


@pytest.mark.parametrize("bits", [8, 16])
def test_packed_statistics_unbiased(bits):
  """E[dropout(x)] == x: keep rate matches the QUANTIZED threshold and
  the kept values are rescaled by that same effective rate."""
  rate = 0.1
  span = 1 << bits
  q = round((1 - rate) * span) / span  # effective keep rate
  x = jnp.ones((64, 8, 8, 32))
  outs = [np.asarray(_apply(Dropout(rate, deterministic=False, bits=bits),
                            x, seed=s)) for s in range(4)]
  out = np.stack(outs)
  kept = out != 0.0
  # keep rate: binomial with n = 4*64*8*8*32 > 500k draws, 5-sigma bound
  n = kept.size
  assert abs(kept.mean() - q) < 5 * np.sqrt(q * (1 - q) / n)
  # scaling: every kept element is exactly 1/q
  np.testing.assert_allclose(out[kept], 1.0 / q, rtol=1e-6)
  # unbiasedness follows: mean ~ 1
  assert abs(out.mean() - 1.0) < 5e-3


@pytest.mark.parametrize("bits", [8, 16, 32])
def test_deterministic_given_key(bits):
  x = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
  a = _apply(Dropout(0.2, deterministic=False, bits=bits), x, seed=3)
  b = _apply(Dropout(0.2, deterministic=False, bits=bits), x, seed=3)
  np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  c = _apply(Dropout(0.2, deterministic=False, bits=bits), x, seed=4)
  assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_channels_not_divisible_falls_back_to_exact():
  """C % pack != 0 uses the exact flax path instead of failing."""
  x = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, 3))
  ours = _apply(Dropout(0.3, deterministic=False, bits=8), x)
  flax_ = nn.Dropout(0.3, deterministic=False).apply(
      {}, x, rngs={"dropout": jax.random.PRNGKey(0)})
  np.testing.assert_array_equal(np.asarray(ours), np.asarray(flax_))


def test_deterministic_mode_is_identity():
  x = jax.random.normal(jax.random.PRNGKey(6), SHAPE)
  for bits in (8, 16, 32):
    out = Dropout(0.5, deterministic=True, bits=bits).apply({}, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


@pytest.mark.parametrize("bits", [8, 16])
def test_packed_mask_sharding_invariant(bits):
  """The packed draw must give identical masks whether the batch axis is
  sharded over 8 devices or replicated on 1 — partitionable threefry plus
  a purely-local last-axis unpack (the property the train step's 1-vs-8
  certification relies on when dropout_bits != 32)."""
  from soft_truncation_tpu.parallel import (batch_sharding, make_mesh,
                                            replicated_sharding)
  x = jnp.ones((16, 4, 4, 8))
  module = Dropout(0.25, deterministic=False, bits=bits)

  def f(x):
    return module.apply({}, x, rngs={"dropout": jax.random.PRNGKey(7)})

  mesh8 = make_mesh()
  out8 = jax.jit(f, in_shardings=batch_sharding(mesh8),
                 out_shardings=batch_sharding(mesh8))(
      jax.device_put(x, batch_sharding(mesh8)))
  mesh1 = make_mesh(devices=jax.devices()[:1])
  out1 = jax.jit(f, in_shardings=replicated_sharding(mesh1),
                 out_shardings=replicated_sharding(mesh1))(
      jax.device_put(x, replicated_sharding(mesh1)))
  np.testing.assert_array_equal(np.asarray(out8), np.asarray(out1))


@pytest.mark.fast
def test_ncsnpp_dropout_bits_plumbing():
  """config.tpu.dropout_bits reaches the res-blocks: same params, same
  key, bits=8 vs 32 produce different train-mode outputs (masks differ)
  but identical eval-mode outputs (dropout off)."""
  from soft_truncation_tpu.configs.base import default_config, override
  from soft_truncation_tpu.models import create_model

  def build(bits):
    config = default_config("cifar10")
    override(config, {
        "data": dict(image_size=8),
        "model": dict(
            name="ncsnpp", scale_by_sigma=False, ema_rate=0.999,
            normalization="GroupNorm", nonlinearity="swish", nf=8,
            ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(4,),
            resamp_with_conv=True, conditional=True, fir=False,
            fir_kernel=[1, 3, 3, 1], skip_rescale=True,
            resblock_type="biggan", progressive="none",
            progressive_input="none", progressive_combine="sum",
            # init_scale MUST be nonzero: a zero-init output conv maps
            # every input to 0, which would make bits=8 vs 32 trivially
            # (and meaninglessly) equal
            init_scale=0.1, embedding_type="fourier", fourier_scale=16,
            dropout=0.5),
    })
    config.tpu.dropout_bits = bits
    return create_model(config)

  m32, m8 = build(32), build(8)
  assert m32.dropout_bits == 32 and m8.dropout_bits == 8

  # 0 = auto (the shipped default) resolves against the LIVE prng impl:
  # 8 under threefry (packing recovers the per-element hash tax), 32
  # under rbg/unsafe_rbg (no tax to recover; unpack only adds HBM
  # traffic — the BENCH_r04 regression this rule fixes).
  default_impl = str(jax.config.jax_default_prng_impl)
  try:
    jax.config.update("jax_default_prng_impl", "threefry2x32")
    assert build(0).dropout_bits == 8
    jax.config.update("jax_default_prng_impl", "rbg")
    assert build(0).dropout_bits == 32
  finally:
    jax.config.update("jax_default_prng_impl", default_impl)
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
  t = jnp.full((2,), 1.0)
  params = m32.init({"params": jax.random.PRNGKey(1)}, x, t,
                    train=False)["params"]
  kw = dict(rngs={"dropout": jax.random.PRNGKey(2)})
  out32 = m32.apply({"params": params}, x, t, train=True, **kw)
  out8 = m8.apply({"params": params}, x, t, train=True, **kw)
  assert not np.allclose(np.asarray(out32), np.asarray(out8))
  e32 = m32.apply({"params": params}, x, t, train=False)
  e8 = m8.apply({"params": params}, x, t, train=False)
  np.testing.assert_array_equal(np.asarray(e32), np.asarray(e8))
