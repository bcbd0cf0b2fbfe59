"""float8 activation quantization for the conv compute path.

`config.tpu.activation_dtype = 'float8_e4m3'` stores every conv INPUT
activation in e4m3 (4 exponent / 3 mantissa bits, 1 byte) instead of
bf16/f32, and runs backward cotangents through an e5m2 round-trip. The
train step is HBM-bandwidth-bound at ~95% of the v5e roofline
(benchmarks/ROOFLINE.md) and activations are the dominant byte term, so
halving their storage is the one lever that can move the single-chip
ceiling itself — the MXU does NOT run fp8 faster than bf16 on a v5e
(measured: the e4m3 win on the dominant conv is byte reduction only).

Design (what is and is not quantized):

  * Conv input activations -> e4m3 at the producer boundary. The cast
    fuses into the producer's loop fusion (GroupNorm/SiLU chains), so
    the slab MATERIALIZED in HBM is 1 byte/elt; the consumer conv reads
    it with an in-kernel upconvert (XLA fuses converts into conv
    operands on TPU — the profiler's `convert_reduce_fusion` kernels).
  * The backward's weight-gradient re-read of the saved activation uses
    the SAME e4m3 residual — the custom VJP stashes x8, not x — halving
    the third copy of the activation traffic too.
  * Weights stay in the compute dtype (bf16/f32). Their traffic is
    amortized over the batch (~2% of step bytes at 62M params / b128)
    and 3-mantissa-bit weights are a needless precision loss.
  * The data-gradient conv's cotangent takes an e5m2 round-trip
    (5 exponent bits — gradients need range, not mantissa): XLA folds
    the converts into the conv operands, so the dx conv reads the
    cotangent at 1 byte/elt. The weight-gradient conv keeps the raw
    compute-dtype cotangent — its other operand is the e4m3 residual
    and the v5e compiler rejects f8e4m3 x f8e5m2 convolutions; the
    bf16 slab it reads was materialized by the upstream kernel anyway
    (byte-neutral). The e5m2 leg still makes the dx numerics
    representative of a native-fp8 pipeline, which the drift tests
    validate.
  * No loss scaling: activations sit O(1) after GroupNorm/SiLU and
    e4m3's normal range is [2^-6, 448]; weights and cotangents keep
    >=8-bit mantissas end to end. Sub-2^-9 values flush to zero — the
    init_scale=0 output conv's 1e-10-scaled weights are untouched
    because weights are never quantized.

Reference parity note: the reference trains in f32 (losses.py,
models/*); this is a beyond-parity throughput knob, default OFF
(`configs/base.py tpu.activation_dtype=''`), validated by trajectory
drift + metric-curve tests rather than bit parity.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

E4M3 = jnp.float8_e4m3fn
E5M2 = jnp.float8_e5m2

#: config.tpu.activation_dtype values this module implements.
SUPPORTED = ("float8_e4m3",)


def _conv(x: Array, w: Array, strides, padding, compute_dtype) -> Array:
  dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
  return lax.conv_general_dilated(
      x, w, strides, padding, dimension_numbers=dn,
      preferred_element_type=jnp.float32).astype(compute_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fp8_conv(x: Array, w: Array, strides, padding, compute_dtype) -> Array:
  """NHWC conv whose input activation lives in HBM as e4m3.

  ``x`` and ``w`` must already be in ``compute_dtype`` (the caller casts,
  exactly like flax ``nn.Conv``); the returned output and both gradients
  are ``compute_dtype`` as well.
  """
  y, _ = _fp8_conv_fwd(x, w, strides, padding, compute_dtype)
  return y


def _fp8_conv_fwd(x, w, strides, padding, compute_dtype):
  x8 = x.astype(E4M3)
  y = _conv(x8.astype(compute_dtype), w, strides, padding, compute_dtype)
  return y, (x8, w)


def _conv_uniform(x: Array, w: Array, strides, padding) -> Array:
  """Conv whose output element type equals its operand type (no
  preferred_element_type): the conv TRANSPOSE rule requires lhs/rhs
  dtypes to match, and transposing the f32-accumulate+downcast form of
  ``_conv`` under bfloat16 compute feeds the f32 cotangent (from the
  convert's transpose) into a conv against the bf16 kernel — TypeError
  at lowering. Element-type-uniform convs are exactly what flax bf16
  training lowers to anyway; the MXU still accumulates in f32."""
  dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
  return lax.conv_general_dilated(x, w, strides, padding,
                                  dimension_numbers=dn)


def _fp8_conv_bwd(strides, padding, compute_dtype, res, g):
  x8, w = res
  # e5m2 round-trip on the data-gradient cotangent (module docstring):
  # XLA folds the converts into the conv operands, so the dx conv reads
  # the cotangent at 1 byte/elt (f8e5m2 x bf16 kernel). The dw conv
  # must NOT use it: its other operand is the e4m3 activation residual,
  # and the v5e compiler rejects f8e4m3 x f8e5m2 convolutions
  # ("Unsupported conversion between element types of operands"). dw
  # consumes the raw compute-dtype cotangent instead — byte-neutral,
  # since the upstream kernel materialized that bf16 slab anyway.
  gu = g.astype(E5M2).astype(compute_dtype)
  xu = x8.astype(compute_dtype)
  (dx,) = jax.linear_transpose(
      lambda xx: _conv_uniform(xx, w, strides, padding),
      jax.ShapeDtypeStruct(xu.shape, compute_dtype))(gu)
  (dw,) = jax.linear_transpose(
      lambda ww: _conv_uniform(xu, ww, strides, padding),
      jax.ShapeDtypeStruct(w.shape, compute_dtype))(g.astype(compute_dtype))
  return dx, dw


fp8_conv.defvjp(_fp8_conv_fwd, _fp8_conv_bwd)


class QConv(nn.Module):
  """Drop-in for ``nn.Conv`` (NHWC, no dilation/groups) with e4m3
  activation storage. Identical param tree ('kernel' HWIO + 'bias'), so
  checkpoints are interchangeable with the nn.Conv path."""

  features: int
  kernel_size: Tuple[int, int]
  strides: Tuple[int, int] = (1, 1)
  padding: Any = "SAME"
  use_bias: bool = True
  kernel_init: Callable = nn.initializers.lecun_normal()
  bias_init: Callable = nn.initializers.zeros
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    kh, kw = self.kernel_size
    kernel = self.param("kernel", self.kernel_init,
                        (kh, kw, x.shape[-1], self.features))
    pad = (self.padding if isinstance(self.padding, str)
           else tuple((int(lo), int(hi)) for lo, hi in self.padding))
    y = fp8_conv(x.astype(self.dtype), kernel.astype(self.dtype),
                 tuple(int(s) for s in self.strides), pad, self.dtype)
    if self.use_bias:
      bias = self.param("bias", self.bias_init, (self.features,))
      y = y + bias.astype(self.dtype)
    return y
