"""Fused GroupNorm-apply + SiLU + 3x3 conv (Pallas, NHWC, forward).

Why: the train/sampling step is HBM-bound (bench.py: ~95% of v5e HBM
bandwidth; sampling ~75-81%), and every res-block runs
``GroupNorm -> SiLU -> conv3x3`` (reference models/layerspp.py:179-287).
XLA computes the norm/act chain as an elementwise fusion whose result is
MATERIALIZED to HBM and re-read by the conv — one bf16 activation slab
write + read per norm that pure fusion cannot remove, estimated ~10% of
step time (benchmarks/ROOFLINE.md, "Implications", item 2). This kernel
reads raw x once, applies the normalization affine + SiLU in VMEM, and
feeds the MXU directly: the normalized slab never exists in HBM.

Scope: FORWARD ONLY (sampling / eval paths — the FID-50k wall-clock
metric). The GN statistics (per-(sample, group) mean/rsqrt) stay in XLA:
they are a cheap fused reduction over the same x read, and keeping them
outside makes the kernel a pure affine+act+conv — no cross-instance
reductions. Wiring into the model is gated behind measurement
(PARITY.md Pallas-FIR precedent: standalone wins must survive in-graph
A/B before becoming a default).

Decomposition: 3x3 SAME conv as 9 shifted [H*W, C] x [C, O] matmuls
accumulated in f32 on the MXU — the layout the MXU actually wants,
avoiding im2col's 9x input duplication.

Grid: one kernel instance per image; whole [H, W, C] block in VMEM
(CIFAR hot shape 32x32x128 bf16 = 256 KB; budget ~2 MB/instance incl.
padded f32 norm buffer and f32 accumulator — fine at <=64x64x128; the
high-res pyramid levels have smaller H*W x C products).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(x_ref, scale_ref, shift_ref, w_ref, b_ref,
            out_ref, *, acc_dtype):
  """One image: out = conv3x3(silu(x*scale + shift), SAME) + b.

  scale/shift are the GroupNorm affine folded per (sample, channel) by
  the wrapper (scale = rsqrt*gamma, shift = beta - mean*scale): passing
  them pre-broadcast as [N, 1, C] keeps every BlockSpec's trailing two
  dims full-array — the Mosaic lowering requires trailing block dims
  divisible by (8, 128) OR equal to the array dims, which a [N, G]
  per-group layout with a (1, G) block violates (observed on-chip;
  interpret mode does not check it)."""
  h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
  o = w_ref.shape[-1]

  x = x_ref[0].astype(jnp.float32)                       # [H, W, C]
  n = x * scale_ref[0] + shift_ref[0]                    # [H,W,C]*[1,C]
  n = n * jax.nn.sigmoid(n)                               # SiLU
  n = n.astype(w_ref.dtype)

  npad = jnp.pad(n, ((1, 1), (1, 1), (0, 0)))             # [H+2, W+2, C]
  acc = jnp.zeros((h * w, o), jnp.float32)
  for dy in range(3):
    for dx in range(3):
      tap = npad[dy:dy + h, dx:dx + w, :].reshape(h * w, c)
      acc = acc + jnp.dot(tap, w_ref[dy, dx],
                          preferred_element_type=jnp.float32)
  acc = acc + b_ref[:].astype(jnp.float32)[None, :]
  out_ref[0] = acc.reshape(h, w, o).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups",))
def gn_silu_conv3x3(x: Array, mean: Array, rsqrt: Array, gamma: Array,
                    beta: Array, w: Array, b: Array,
                    groups: int = 32) -> Array:
  """conv3x3(silu((x - mean_g) * rsqrt_g * gamma + beta), SAME) + b.

  x: [N, H, W, C]; mean/rsqrt: [N, G] per-(sample, group) statistics
  (rsqrt = 1/sqrt(var + eps), computed by the caller); gamma/beta: [C];
  w: [3, 3, C, O]; b: [O]. Returns [N, H, W, O] in x.dtype.
  """
  n, h, wd, c = x.shape
  o = w.shape[-1]
  # fold the per-(sample, group) stats + per-channel affine into
  # per-(sample, channel) scale/shift in XLA (tiny elementwise, fused)
  cg = c // groups
  scale = (jnp.repeat(rsqrt, cg, axis=1) * gamma[None, :])       # [N, C]
  shift = beta[None, :] - jnp.repeat(mean, cg, axis=1) * scale   # [N, C]
  scale = scale.reshape(n, 1, c).astype(jnp.float32)
  shift = shift.reshape(n, 1, c).astype(jnp.float32)
  kern = functools.partial(_kernel, acc_dtype=jnp.float32)
  flops = 2 * n * h * wd * c * o * 9
  return pl.pallas_call(
      kern,
      grid=(n,),
      in_specs=[
          pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((3, 3, c, o), lambda i: (0, 0, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((o,), lambda i: (0,), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, h, wd, o), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, h, wd, o), x.dtype),
      cost_estimate=pl.CostEstimate(
          flops=flops,
          bytes_accessed=x.size * x.dtype.itemsize
          + n * h * wd * o * x.dtype.itemsize + w.size * w.dtype.itemsize,
          transcendentals=n * h * wd * c,
      ),
  )(x, scale, shift, w, b)


def gn_stats(x: Array, groups: int = 32, eps: float = 1e-6):
  """Per-(sample, group) (mean, rsqrt) of an NHWC tensor in f32 — the
  cheap reduction half of GroupNorm that stays in XLA (fused with the
  x read)."""
  n, h, w, c = x.shape
  xg = x.astype(jnp.float32).reshape(n, h * w, groups, c // groups)
  mean = xg.mean(axis=(1, 3))
  var = jnp.square(xg).mean(axis=(1, 3)) - jnp.square(mean)
  return mean, jax.lax.rsqrt(var + eps)


def gn_silu_conv3x3_reference(x, gamma, beta, w, b, groups: int = 32,
                              eps: float = 1e-6):
  """XLA chain the kernel is A/B'd against: GroupNorm -> SiLU -> conv."""
  mean, rsqrt = gn_stats(x, groups, eps)
  n_, h_, w_d, c = x.shape
  cg = c // groups
  mean_c = jnp.repeat(mean, cg, axis=1).reshape(n_, 1, 1, c)
  rs_c = jnp.repeat(rsqrt, cg, axis=1).reshape(n_, 1, 1, c)
  norm = (x.astype(jnp.float32) - mean_c) * rs_c * gamma + beta
  act = (norm * jax.nn.sigmoid(norm)).astype(x.dtype)
  dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                      ("NHWC", "HWIO", "NHWC"))
  out = jax.lax.conv_general_dilated(act, w, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
  return (out + b[None, None, None, :]).astype(x.dtype)
