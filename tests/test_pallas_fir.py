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
