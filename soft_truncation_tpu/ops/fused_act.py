"""Fused bias + activation, kept as a named primitive for parity benching.

The reference ships a CUDA elementwise kernel for bias-add + LeakyReLU with
a sqrt(2) gain (reference: op/fused_bias_act_kernel.cu:36-45,
op/fused_act.py:74-97). On TPU this is a pure VPU fusion that XLA performs
automatically once the ops are adjacent — so the "kernel" here is simply a
jitted function with the same signature and semantics. A Pallas version
would add nothing: there is no adjacent matmul to fuse into and no
reduction, so XLA's fusion is already bandwidth-bound optimal.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("negative_slope", "scale", "act"))
def fused_bias_act(x: Array, bias: Array | None = None, *,
                   act: str = "lrelu", negative_slope: float = 0.2,
                   scale: float = math.sqrt(2.0)) -> Array:
  """bias-add then activation then gain, in one fused elementwise pass.

  act: 'linear' (mode 1 in the reference kernel) or 'lrelu' (mode 3).
  Bias broadcasts over the channel (last) axis.
  """
  if bias is not None:
    x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
  if act == "linear":
    return x
  if act == "lrelu":
    return jnp.where(x >= 0, x, x * negative_slope) * scale
  raise ValueError(f"unknown act {act!r}")


def fused_leaky_relu(x: Array, bias: Array | None = None,
                     negative_slope: float = 0.2,
                     scale: float = 2.0 ** 0.5) -> Array:
  """Drop-in equivalent of reference op/fused_act.py:86-94 (NHWC bias)."""
  return fused_bias_act(x, bias, act="lrelu", negative_slope=negative_slope,
                        scale=scale)


class FusedLeakyReLU:
  """Module form with a learnable bias (reference op/fused_act.py:74-83).

  Flax version for completeness — the model zoo doesn't use it (it's a
  StyleGAN2 leftover in the reference too), but the fused pattern is the
  named primitive above.
  """

  def __new__(cls, channels: int, negative_slope: float = 0.2,
              scale: float = 2.0 ** 0.5):
    import flax.linen as nn

    class _FusedLeakyReLU(nn.Module):
      channels: int
      negative_slope: float
      scale: float

      @nn.compact
      def __call__(self, x: Array) -> Array:
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return fused_leaky_relu(x, bias, self.negative_slope, self.scale)

    return _FusedLeakyReLU(channels, negative_slope, scale)
