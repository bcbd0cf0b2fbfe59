"""Learned monotone log-SNR noise schedule (reference models/logsnr.py:5-33).

Vestigial in the reference (never registered by any config; only hooked in
sampling.Predictor.__init__, sampling.py:131-142) — included for
completeness. Monotonicity comes from softplus-positive dense weights;
the output is endpoint-normalized to [gamma_min, gamma_min + softplus(gap)].
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class PosDense(nn.Module):
  """Dense layer with softplus-constrained positive weights."""

  features: int

  @nn.compact
  def __call__(self, x: Array) -> Array:
    kernel = self.param("kernel", nn.initializers.lecun_normal(),
                        (x.shape[-1], self.features))
    bias = self.param("bias", nn.initializers.zeros, (self.features,))
    return x @ jax.nn.softplus(kernel) + bias


class LogSNR(nn.Module):
  """gamma(t): monotone in t, normalized to learned endpoints."""

  mid_dim: int = 1024
  gamma_min_init: float = -10.0
  gamma_gap_init: float = 20.0

  @nn.compact
  def __call__(self, t: Array) -> Array:
    t = t.reshape(-1, 1)
    gamma_min = self.param("gamma_min",
                           nn.initializers.constant(self.gamma_min_init), ())
    gamma_gap = self.param("gamma_gap",
                           nn.initializers.constant(self.gamma_gap_init), ())

    l1 = PosDense(1, name="l1")
    l2 = PosDense(self.mid_dim, name="l2")
    l3 = PosDense(1, name="l3")

    def body(u):
      h = l1(u)
      return h + l3(nn.sigmoid(l2(h)))

    # endpoint normalization over [0, 1]
    g_t = body(t)
    g_0 = body(jnp.zeros_like(t))
    g_1 = body(jnp.ones_like(t))
    norm = (g_t - g_0) / (g_1 - g_0)
    return (gamma_min + jax.nn.softplus(gamma_gap) * norm).reshape(-1)
