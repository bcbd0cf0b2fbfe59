"""Property-based tests for the dilated-conv upfirdn2d against an
independent numpy/scipy oracle.

The golden tests (test_ops.py) pin upfirdn2d to reference-generated
fixtures at the parameter points the models use; these sweep the FULL
(up, down, pad, kernel, size) space against a from-the-definition
oracle — zero-insertion upsample (zeros after the last sample too), pad
or crop, true 2-D convolution, stride-down — i.e. the semantics of the
reference CPU fallback (reference op/upfirdn2d.py:159-200) implemented
a third way (scipy.signal.convolve2d), so a shared blind spot with the
conv formulation is impossible.
"""

import numpy as np
import pytest
from hypothesis import assume, given, settings, strategies as st
from scipy import signal

from soft_truncation_tpu.ops.resample import upfirdn2d

_SETTINGS = dict(max_examples=40, deadline=None, derandomize=True)


def _oracle(x, k, up, down, pad0, pad1):
  """upfirdn2d per the definition, on numpy float64."""
  b, h, w, c = x.shape
  xu = np.zeros((b, h * up, w * up, c), np.float64)
  xu[:, ::up, ::up, :] = x
  # pad (>=0) then crop (<0), leading and trailing independently
  lead, trail = max(pad0, 0), max(pad1, 0)
  xp = np.pad(xu, ((0, 0), (lead, trail), (lead, trail), (0, 0)))
  if pad0 < 0:
    xp = xp[:, -pad0:, -pad0:, :]
  if pad1 < 0:
    xp = xp[:, :pad1, :pad1, :]
  out = np.stack([
      np.stack([signal.convolve2d(xp[i, :, :, j], k, mode="valid")
                for j in range(c)], axis=-1)
      for i in range(b)])
  return out[:, ::down, ::down, :]


@settings(**_SETTINGS)
@given(
    up=st.integers(1, 3), down=st.integers(1, 3),
    kh=st.integers(1, 4), kw=st.integers(1, 4),
    h=st.integers(3, 8), w=st.integers(3, 8),
    pad0=st.integers(-2, 3), pad1=st.integers(-2, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_upfirdn2d_matches_definition(up, down, kh, kw, h, w, pad0, pad1,
                                      seed):
  # Keep crops inside the upsampled extent and the output non-empty.
  assume(h * up + pad0 + pad1 >= kh)
  assume(w * up + pad0 + pad1 >= kw)
  assume(pad0 > -(h * up) and pad0 > -(w * up))
  assume(pad1 > -(h * up) and pad1 > -(w * up))
  rng = np.random.default_rng(seed)
  x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
  k = rng.standard_normal((kh, kw)).astype(np.float32)

  got = np.asarray(upfirdn2d(x, k, up=up, down=down, pad=(pad0, pad1)))
  want = _oracle(x.astype(np.float64), k.astype(np.float64),
                 up, down, pad0, pad1)
  assert got.shape == want.shape, (got.shape, want.shape)
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("up,down,pad", [(2, 1, (2, 1)), (1, 2, (1, 1)),
                                         (3, 2, (-1, 2))])
def test_upfirdn2d_gradients(up, down, pad):
  """Autodiff gradients (the reference hand-writes its backward; ours
  must come out of the conv formulation for free) — finite-difference
  checked, rev mode to second order like the reference's double-backward
  support (op/upfirdn2d.py:62-85)."""
  import jax
  from jax.test_util import check_grads
  rng = np.random.default_rng(0)
  x = rng.standard_normal((1, 5, 5, 2)).astype(np.float32)
  k = rng.standard_normal((3, 3)).astype(np.float32)
  f = lambda xx: upfirdn2d(xx, k, up=up, down=down, pad=pad).sum()
  check_grads(f, (x,), order=2, modes=("rev",), atol=1e-2, rtol=1e-2)
