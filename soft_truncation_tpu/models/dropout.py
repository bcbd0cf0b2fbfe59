"""Dropout with a configurable random-bit budget per mask element.

The reproducibility tax, measured (benchmarks/ROOFLINE.md, e2e table):
under the bit-reproducible default PRNG (threefry2x32, partitionable)
dropout-mask generation costs ~25% of the flagship train step — the CLI
trains at 1,466 imgs/s vs 1,883 with `unsafe_rbg`. The cost is threefry
hashing, and it is per-ELEMENT: in partitionable mode JAX's
`random.bits(..., uint8)` still computes one 64-bit threefry block per
element and truncates (jax._src.prng._threefry_random_bits_partitionable),
so asking for narrower dtypes saves nothing.

This module actually reduces the hash count: draw one uint32 word per
PACK elements (PACK = 32/bits along the channel axis), bit-unpack into
uint8/uint16 lanes, and threshold. A dropout mask needs ~1 bit of
entropy per element; 8 bits quantize the keep-rate to 1/256 (rate 0.1 ->
effective 26/256 = 0.1016), 16 bits to 1/65536 (immaterial). The mask is
rescaled by the EFFECTIVE keep rate, so the estimator stays unbiased.

Properties preserved relative to `nn.Dropout` + threefry:
  * run-to-run determinism for a fixed seed (pure function of the key);
  * GSPMD sharding invariance: the packed draw has shape
    [..., C // PACK], batch/spatial dims intact, so partitionable
    threefry emits identical bits under any sharding, and the unpack is
    a purely local last-axis reshape (verified in
    tests/test_sharding_invariance.py);
  * identical rng-collection plumbing ('dropout' via make_rng).

`bits=32` (the default) is bit-identical to `flax.linen.Dropout`:
same bernoulli draw from the same rng, same x/keep scaling.

Reference counterpart: torch nn.Dropout inside the res-blocks
(models/layerspp.py:200,255 in the reference); the bit-budget knob is a
rebuild extension (config.tpu.dropout_bits).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class Dropout(nn.Module):
  """Drop-in replacement for `nn.Dropout(rate, deterministic)` with a
  `bits` knob: 32 = exact flax parity (f32 bernoulli), 16/8 = packed
  uint threshold masks (2x/4x fewer threefry hashes)."""

  rate: float
  deterministic: bool = False
  bits: int = 32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    if self.deterministic or self.rate == 0.0:
      return x
    if self.rate == 1.0:
      return jnp.zeros_like(x)
    keep = 1.0 - self.rate
    rng = self.make_rng("dropout")

    pack = 32 // self.bits if self.bits in (8, 16) else 1
    channels = x.shape[-1]
    if pack == 1 or channels % pack != 0:
      # exact flax.linen.Dropout semantics (same draw, same scaling)
      mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
      return jnp.where(mask, x / keep, jnp.zeros_like(x))

    udtype = jnp.uint8 if self.bits == 8 else jnp.uint16
    span = 1 << self.bits
    thresh = int(round(keep * span))
    q = thresh / span  # effective keep rate after quantization
    words = jax.random.bits(rng, x.shape[:-1] + (channels // pack,),
                            jnp.uint32)
    lanes = jax.lax.bitcast_convert_type(words, udtype)  # [..., C//pack, pack]
    lanes = lanes.reshape(x.shape)
    if thresh >= span:  # rate below half a quantization step: keep all
      return x
    mask = lanes < jnp.asarray(thresh, udtype)
    return jnp.where(mask, x / q, jnp.zeros_like(x))
