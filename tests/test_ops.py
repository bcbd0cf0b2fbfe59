"""Golden parity tests for ops/resample.py and ops/fused_act.py.

Fixtures generated from the reference torch CPU implementations
(tools/make_ops_goldens.py); stored NCHW, transposed here to NHWC.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_truncation_tpu.ops import (
    upfirdn2d, upsample_2d, downsample_2d, upsample_conv_2d,
    conv_downsample_2d, naive_upsample_2d, naive_downsample_2d,
    fused_leaky_relu, fused_bias_act)

GOLD = np.load(os.path.join(os.path.dirname(__file__), "golden",
                            "ops_golden.npz"))


def to_nhwc(a):
  return np.transpose(a, (0, 2, 3, 1))


def to_hwio(w):  # torch OIHW -> jax HWIO
  return np.transpose(w, (2, 3, 1, 0))


X = jnp.asarray(to_nhwc(GOLD["x"]))
X8 = jnp.asarray(to_nhwc(GOLD["x8"]))
K = jnp.asarray(GOLD["k"])


@pytest.mark.parametrize("i", range(7))
def test_upfirdn2d_cases(i):
  up, down, p0, p1 = GOLD[f"case{i}_params"]
  got = upfirdn2d(X, K, up=int(up), down=int(down), pad=(int(p0), int(p1)))
  np.testing.assert_allclose(got, to_nhwc(GOLD[f"case{i}"]), rtol=1e-5,
                             atol=1e-6)


def test_upfirdn2d_asymmetric_kernel_and_pads():
  # reference native call: up=2, down=1, pad_x=(1,1), pad_y=(2,0), 2x3 kernel
  k2 = jnp.asarray(GOLD["k2"])
  from soft_truncation_tpu.ops.resample import _upfirdn2d
  got = _upfirdn2d(X, k2, 2, 2, 1, 1, 1, 1, 2, 0)
  np.testing.assert_allclose(got, to_nhwc(GOLD["asym"]), rtol=1e-5, atol=1e-6)


def test_upsample_2d():
  got = upsample_2d(X, [1, 3, 3, 1], factor=2)
  np.testing.assert_allclose(got, to_nhwc(GOLD["upsample_2d"]), rtol=1e-5,
                             atol=1e-6)


def test_downsample_2d():
  got = downsample_2d(X8, [1, 3, 3, 1], factor=2)
  np.testing.assert_allclose(got, to_nhwc(GOLD["downsample_2d"]), rtol=1e-5,
                             atol=1e-6)


def test_naive_resamples():
  np.testing.assert_allclose(naive_upsample_2d(X8), to_nhwc(GOLD["naive_up"]),
                             rtol=1e-6, atol=1e-6)
  np.testing.assert_allclose(naive_downsample_2d(X8),
                             to_nhwc(GOLD["naive_down"]), rtol=1e-6, atol=1e-6)


def test_upsample_conv_2d():
  w = jnp.asarray(to_hwio(GOLD["w"]))
  got = upsample_conv_2d(X8, w, k=[1, 3, 3, 1])
  np.testing.assert_allclose(got, to_nhwc(GOLD["upsample_conv_2d"]),
                             rtol=1e-4, atol=1e-5)


def test_upsample_conv_1x1():
  w = jnp.asarray(to_hwio(GOLD["w1"]))
  got = upsample_conv_2d(X8, w, k=[1, 3, 3, 1])
  np.testing.assert_allclose(got, to_nhwc(GOLD["upsample_conv_1x1"]),
                             rtol=1e-4, atol=1e-5)


def test_conv_downsample_2d():
  w = jnp.asarray(to_hwio(GOLD["w"]))
  got = conv_downsample_2d(X8, w, k=[1, 3, 3, 1])
  np.testing.assert_allclose(got, to_nhwc(GOLD["conv_downsample_2d"]),
                             rtol=1e-4, atol=1e-5)
  w1 = jnp.asarray(to_hwio(GOLD["w1"]))
  got1 = conv_downsample_2d(X8, w1, k=[1, 3, 3, 1])
  np.testing.assert_allclose(got1, to_nhwc(GOLD["conv_downsample_1x1"]),
                             rtol=1e-4, atol=1e-5)


def test_upfirdn2d_shape_formula():
  for up, down, p0, p1 in [(2, 1, 2, 1), (1, 2, 1, 2), (3, 2, 4, 3)]:
    got = upfirdn2d(X8, K, up=up, down=down, pad=(p0, p1))
    expect = (8 * up + p0 + p1 - 4) // down + 1
    assert got.shape == (2, expect, expect, 3)


def test_upfirdn2d_gradient():
  """Autodiff through the dilated conv must match finite differences."""
  k = jnp.asarray([[0.25, 0.5], [0.5, 1.0]])
  x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 5, 2))
  f = lambda x_: jnp.sum(upfirdn2d(x_, k, up=2, down=2, pad=(1, 1)) ** 2)
  g = jax.grad(f)(x)
  eps = 1e-3
  d = jnp.zeros_like(x).at[0, 2, 3, 1].set(1.0)
  fd = (f(x + eps * d) - f(x - eps * d)) / (2 * eps)
  np.testing.assert_allclose(g[0, 2, 3, 1], fd, rtol=1e-3)


def test_fused_leaky_relu():
  x = jnp.asarray([[-1.0, 0.0, 2.0], [3.0, -0.5, 1.0]]).reshape(1, 2, 3, 1)
  b = jnp.asarray([0.5])
  got = fused_leaky_relu(x, b)
  ref = np.asarray(x) + 0.5
  ref = np.where(ref >= 0, ref, ref * 0.2) * math.sqrt(2.0)
  np.testing.assert_allclose(got, ref, rtol=1e-6)
  lin = fused_bias_act(x, b, act="linear")
  np.testing.assert_allclose(lin, np.asarray(x) + 0.5, rtol=1e-6)
