"""Pallas TPU kernels for separable FIR 2x resampling (StyleGAN2 paths).

The generic upfirdn2d lowers to a dilated depthwise conv (ops/resample.py),
which on an up=2 path multiplies 75% zeros (the inserted ones) and walks
XLA's general conv machinery for what is really a 2-tap polyphase filter.
These kernels keep one image block resident in VMEM and do the exact
polyphase arithmetic on the VPU:

  up=2   out[2i+p] = sum_{t: (p+t-pad0) even} K[T-1-t] * x[i + (p+t-pad0)/2]
  down=2 out[j]    = sum_t K[T-1-t] * x_padded[2j + t]

applied separably over H then W. Math parity target: reference
op/upfirdn2d.py:159-200 with the standard upsample_2d/downsample_2d pad
choices (models/up_or_down_sampling.py:195-257).

Grid: (batch, channel-tiles) — channels ride the 128-wide lane dimension;
each program owns a [H, W, Ct] block.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # TPU-only import is fine to fail on CPU-only builds
  from jax.experimental.pallas import tpu as pltpu
  _HAVE_PLTPU = True
except Exception:  # pragma: no cover
  pltpu = None
  _HAVE_PLTPU = False


def pallas_available() -> bool:
  try:
    return _HAVE_PLTPU and jax.default_backend() == "tpu"
  except Exception:  # pragma: no cover
    return False


def _phase_taps_up2(T: int, pad0: int) -> Tuple[list, list]:
  """For each output phase p, the (kernel_index, input_offset) pairs."""
  phases = []
  for p in (0, 1):
    taps = []
    for t in range(T):
      if (p + t - pad0) % 2 == 0:
        taps.append((T - 1 - t, (p + t - pad0) // 2))
      # kernel coefficient used is K[T-1-t] (flip = true convolution)
    phases.append(taps)
  return phases[0], phases[1]


def _up2_axis(x, k: np.ndarray, pad0: int, pad1: int, axis: int):
  """Polyphase 2x upsample + FIR along ``axis`` (static everything)."""
  T = len(k)
  L = x.shape[axis]
  M = 2 * L + pad0 + pad1 - T + 1
  assert M == 2 * L, (
      f"up2 path expects output 2L (got M={M}, L={L}); use the lax path")
  taps0, taps1 = _phase_taps_up2(T, pad0)
  offsets = [o for _, o in taps0 + taps1]
  lo, hi = -min(min(offsets), 0), max(max(offsets) + 1 - 1, 0)
  pad_width = [(0, 0)] * x.ndim
  pad_width[axis] = (lo, hi)
  xp = jnp.pad(x, pad_width)

  def take(o, n):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(lo + o, lo + o + n)
    return xp[tuple(idx)]

  outs = []
  for taps in (taps0, taps1):
    acc = None
    for ki, o in taps:
      term = float(k[ki]) * take(o, L)
      acc = term if acc is None else acc + term
    outs.append(acc)
  # interleave phases along axis
  stacked = jnp.stack(outs, axis=axis + 1)  # [..., L, 2, ...]
  new_shape = list(x.shape)
  new_shape[axis] = 2 * L
  return stacked.reshape(new_shape)


def _down2_axis(x, k: np.ndarray, pad0: int, pad1: int, axis: int):
  """FIR + 2x downsample along ``axis``.

  Mosaic cannot lower stride-2 slices on non-lane axes, so the padded
  signal is reshaped into even/odd phases and every tap becomes a
  CONTIGUOUS slice: x_padded[2j + t] == phase[t%2][j + t//2].
  """
  T = len(k)
  L = x.shape[axis]
  M = (L + pad0 + pad1 - T) // 2 + 1
  pad_width = [(0, 0)] * x.ndim
  # extra trailing pad so the phase reshape length covers j + t//2 and is
  # even; padded tail values are never read by valid taps
  extra = (2 * M + T) - (L + pad0 + pad1)
  extra += (L + pad0 + pad1 + extra) % 2
  pad_width[axis] = (pad0, pad1 + max(extra, 0))
  xp = jnp.pad(x, pad_width)
  lp = xp.shape[axis]

  shape = list(xp.shape)
  shape[axis:axis + 1] = [lp // 2, 2]
  ph = xp.reshape(shape)

  def phase_slice(parity, start, n):
    idx = [slice(None)] * ph.ndim
    idx[axis] = slice(start, start + n)
    idx[axis + 1] = parity
    return ph[tuple(idx)]

  acc = None
  for t in range(T):
    term = float(k[T - 1 - t]) * phase_slice(t % 2, t // 2, M)
    acc = term if acc is None else acc + term
  return acc


def _fir2d(x, k: np.ndarray, pad0: int, pad1: int, mode: str):
  """Separable 2-D pass over a [..., H, W, C] block."""
  f = _up2_axis if mode == "up" else _down2_axis
  h_axis = x.ndim - 3
  y = f(x, k, pad0, pad1, axis=h_axis)
  return f(y, k, pad0, pad1, axis=h_axis + 1)


def _resample_pallas(x, k1d: np.ndarray, pad0: int, pad1: int, mode: str,
                     channel_tile: int = 128,
                     vmem_budget: int = 4 * 1024 * 1024,
                     interpret: bool = False):
  """x: [N, H, W, C] -> FIR 2x up/down via a Pallas kernel.

  Grid: (batch-tiles, channel-tiles); the batch tile is sized so the
  in+out blocks fit the VMEM budget — bigger blocks amortize per-program
  overhead (matters when the op sits inside a large fused train graph).
  """
  n, h, w, c = x.shape
  ct = min(c, channel_tile)
  while c % ct != 0:
    ct //= 2
  out_h = 2 * h if mode == "up" else (h + pad0 + pad1 - len(k1d)) // 2 + 1
  out_w = 2 * w if mode == "up" else (w + pad0 + pad1 - len(k1d)) // 2 + 1

  bytes_per_item = (h * w + out_h * out_w) * ct * x.dtype.itemsize * 2
  bt = max(1, min(n, vmem_budget // max(bytes_per_item, 1)))
  while n % bt != 0:
    bt -= 1

  def kernel(x_ref, o_ref):
    o_ref[...] = _fir2d(x_ref[...], k1d, pad0, pad1, mode)

  return pl.pallas_call(
      kernel,
      grid=(n // bt, c // ct),
      in_specs=[pl.BlockSpec((bt, h, w, ct), lambda i, j: (i, 0, 0, j))],
      out_specs=pl.BlockSpec((bt, out_h, out_w, ct),
                             lambda i, j: (i, 0, 0, j)),
      out_shape=jax.ShapeDtypeStruct((n, out_h, out_w, c), x.dtype),
      interpret=interpret,
  )(x)


def _setup_1d(k, gain: float) -> np.ndarray:
  k = np.asarray(k, dtype=np.float64)
  assert k.ndim == 1, "pallas FIR path requires a separable (1-D) kernel"
  k = k / np.sum(k)
  return (k * gain).astype(np.float64)


def _lax_equivalent(x, k: Tuple[float, ...], gain: float, mode: str):
  """The dilated-conv formulation with identical semantics — used as the
  linear-transpose source for the custom VJP (upfirdn is linear in x, so
  the exact adjoint comes from jax.linear_transpose; lowered by XLA to a
  transposed conv)."""
  from ..resample import setup_fir_kernel, upfirdn2d
  if mode == "up":
    k2 = setup_fir_kernel(np.asarray(k), gain * 4)
    p = k2.shape[0] - 2
    return upfirdn2d(x, k2, up=2, pad=((p + 1) // 2 + 1, p // 2))
  k2 = setup_fir_kernel(np.asarray(k), gain)
  p = k2.shape[0] - 2
  return upfirdn2d(x, k2, down=2, pad=((p + 1) // 2, p // 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fir2_op(x, k: Tuple[float, ...], gain: float, mode: str):
  axis_gain = math.sqrt(gain) * (2.0 if mode == "up" else 1.0)
  k1d = _setup_1d(k, axis_gain)
  T = len(k1d)
  p = T - 2
  if mode == "up":
    pad0, pad1 = (p + 1) // 2 + 1, p // 2
  else:
    pad0, pad1 = (p + 1) // 2, p // 2
  return _resample_pallas(x, k1d, pad0, pad1, mode)


def _fir2_fwd(x, k, gain, mode):
  return _fir2_op(x, k, gain, mode), None


def _fir2_bwd(k, gain, mode, res, ybar):
  """Pallas backward: the adjoint of a stride-2 polyphase FIR is itself a
  stride-2 polyphase FIR with REVERSED taps and mirrored pads.

  Derivation (per axis, T taps, forward pads (pad0, pad1)):
    adjoint(up2)   = down2 with taps reverse(K), pads (T-1-pad0, pad0-1)
    adjoint(down2) = up2  with taps reverse(K), pads (T-1-pad0, pad0)
  For even T these mirrored pads coincide with the standard
  upsample_2d/downsample_2d pad choices, so the backward is expressed as
  another _fir2_op call — giving a Pallas backward AND double-backward
  for free (the recursion bottoms out because each call is linear). The
  coefficient scale carries over exactly:
    down2 uses k/sum*sqrt(g) per axis  -> adjoint up2 needs gain g/4
    up2   uses k/sum*sqrt(g)*2         -> adjoint down2 needs gain 4g
  (sum(k) is flip-invariant). Odd-T kernels (unused by any config) fall
  back to the exact lax-path linear transpose.
  """
  del res  # input shape is recoverable from the cotangent
  T = len(k)
  if T % 2 == 0:
    k_rev = tuple(reversed(k))
    if mode == "up":
      return (_fir2_op(ybar, k_rev, 4.0 * gain, "down"),)
    return (_fir2_op(ybar, k_rev, gain / 4.0, "up"),)

  n, mh, mw, c = ybar.shape
  if mode == "up":
    shape = (n, mh // 2, mw // 2, c)
  else:
    pad_sum = (T - 1) // 2 + (T - 2) // 2
    # invert M = (L + pad_sum - T)//2 + 1  ->  L = 2M - 2 + T - pad_sum
    shape = (n, 2 * mh - 2 + T - pad_sum, 2 * mw - 2 + T - pad_sum, c)
  transpose = jax.linear_transpose(
      lambda x_: _lax_equivalent(x_, k, gain, mode),
      jax.ShapeDtypeStruct(shape, ybar.dtype))
  (xbar,) = transpose(ybar)
  return (xbar,)


_fir2_op.defvjp(_fir2_fwd, _fir2_bwd)


def fir_upsample2_pallas(x, k: Sequence[float], gain: float = 1.0,
                         interpret: bool = False):
  """2x FIR upsample, parity with ops.resample.upsample_2d(factor=2).

  upsample_2d applies the 2-D outer-product kernel scaled by
  gain * factor^2; separably that is (k/sum * sqrt(gain) * factor) per
  axis. Differentiable (custom VJP; exact adjoint).
  """
  if interpret:
    k1d = _setup_1d(k, math.sqrt(gain) * 2.0)
    T = len(k1d)
    p = T - 2
    return _resample_pallas_interpret(x, k1d, (p + 1) // 2 + 1, p // 2,
                                      "up")
  return _fir2_op(x, tuple(float(v) for v in k), float(gain), "up")


def fir_downsample2_pallas(x, k: Sequence[float], gain: float = 1.0,
                           interpret: bool = False):
  """2x FIR downsample, parity with ops.resample.downsample_2d(factor=2).
  Differentiable (custom VJP; exact adjoint)."""
  if interpret:
    k1d = _setup_1d(k, math.sqrt(gain))
    T = len(k1d)
    p = T - 2
    return _resample_pallas_interpret(x, k1d, (p + 1) // 2, p // 2, "down")
  return _fir2_op(x, tuple(float(v) for v in k), float(gain), "down")


def _resample_pallas_interpret(x, k1d, pad0, pad1, mode):
  """Interpreter-mode variant for CPU parity tests."""
  return _resample_pallas(x, k1d, pad0, pad1, mode, interpret=True)
