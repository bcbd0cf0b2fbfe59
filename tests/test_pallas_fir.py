"""Pallas polyphase FIR kernels vs the lax dilated-conv reference path.

Runs in interpreter mode on CPU; the same kernel body compiles on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_truncation_tpu.ops.pallas.fir import (fir_downsample2_pallas,
                                                fir_upsample2_pallas)
from soft_truncation_tpu.ops.resample import (setup_fir_kernel, upfirdn2d)


def lax_upsample2(x, k, gain=1.0):
  k2 = setup_fir_kernel(k, gain * 4)
  p = k2.shape[0] - 2
  return upfirdn2d(x, k2, up=2, pad=((p + 1) // 2 + 1, p // 2))


def lax_downsample2(x, k, gain=1.0):
  k2 = setup_fir_kernel(k, gain)
  p = k2.shape[0] - 2
  return upfirdn2d(x, k2, down=2, pad=((p + 1) // 2, p // 2))


@pytest.mark.parametrize("k", [[1., 3., 3., 1.], [1., 1.],
                               [1., 2., 4., 2., 1., 1.]],
                         ids=["fir1331", "box", "len6"])
@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 16, 16, 8)])
def test_pallas_up2_parity(k, shape):
  x = jax.random.normal(jax.random.PRNGKey(0), shape)
  want = lax_upsample2(x, k)
  got = fir_upsample2_pallas(x, k, interpret=True)
  assert got.shape == want.shape
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [[1., 3., 3., 1.], [1., 1.]],
                         ids=["fir1331", "box"])
@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 16, 16, 8)])
def test_pallas_down2_parity(k, shape):
  x = jax.random.normal(jax.random.PRNGKey(1), shape)
  want = lax_downsample2(x, k)
  got = fir_downsample2_pallas(x, k, interpret=True)
  assert got.shape == want.shape
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_pallas_up2_gain():
  x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 2))
  want = lax_upsample2(x, [1., 3., 3., 1.], gain=2.0)
  got = fir_upsample2_pallas(x, [1., 3., 3., 1.], gain=2.0, interpret=True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [[1., 3., 3., 1.], [1., 1.]],
                         ids=["fir1331", "box"])
@pytest.mark.parametrize("gain", [1.0, 2.0])
def test_mirrored_pad_adjoint_up2(k, gain):
  """The Pallas backward's algebra: adjoint(up2) == down2 with reversed
  taps and gain*4 (fir.py _fir2_bwd derivation), checked against the
  exact linear transpose of the lax path."""
  from soft_truncation_tpu.ops.pallas.fir import _lax_equivalent
  x_shape = jax.ShapeDtypeStruct((2, 8, 8, 3), jnp.float32)
  ybar = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3))
  (want,) = jax.linear_transpose(
      lambda x: _lax_equivalent(x, tuple(k), gain, "up"), x_shape)(ybar)
  got = fir_downsample2_pallas(ybar, list(reversed(k)), gain=4.0 * gain,
                               interpret=True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [[1., 3., 3., 1.], [1., 1.]],
                         ids=["fir1331", "box"])
@pytest.mark.parametrize("gain", [1.0, 2.0])
def test_mirrored_pad_adjoint_down2(k, gain):
  """adjoint(down2) == up2 with reversed taps and gain/4."""
  from soft_truncation_tpu.ops.pallas.fir import _lax_equivalent
  x_shape = jax.ShapeDtypeStruct((2, 16, 16, 3), jnp.float32)
  ybar = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 3))
  (want,) = jax.linear_transpose(
      lambda x: _lax_equivalent(x, tuple(k), gain, "down"), x_shape)(ybar)
  got = fir_upsample2_pallas(ybar, list(reversed(k)), gain=gain / 4.0,
                             interpret=True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_asymmetric_kernel_adjoint():
  """Tap reversal matters: an asymmetric kernel must still satisfy the
  adjoint identity <up2(x), y> == <x, adjoint(y)>."""
  k = [1., 2., 3., 2.]
  x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 2))
  y = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 16, 2))
  fwd = fir_upsample2_pallas(x, k, interpret=True)
  adj = fir_downsample2_pallas(y, list(reversed(k)), gain=4.0,
                               interpret=True)
  lhs = float(jnp.vdot(fwd, y))
  rhs = float(jnp.vdot(x, adj))
  assert lhs == pytest.approx(rhs, rel=1e-5)
