"""StyleGAN2-style FIR resampling as a single XLA dilated convolution.

TPU-native replacement for the reference's hand-written CUDA kernel
(reference: op/upfirdn2d_kernel.cu, exact semantics specified by the CPU
fallback op/upfirdn2d.py:159-200). The whole
upsample -> pad/crop -> FIR filter -> downsample chain maps onto ONE
``lax.conv_general_dilated`` call:

  * zero-insertion upsample  -> ``lhs_dilation=(up, up)`` (plus ``up-1``
    extra trailing pad: upfirdn zero-pads AFTER the last sample too,
    while lhs_dilation only inserts zeros BETWEEN samples)
  * pad/crop                 -> explicit (possibly negative) padding
  * FIR filter (convolution) -> depthwise conv with the spatially
    flipped kernel (lax convs are correlations)
  * downsample               -> ``window_strides=(down, down)``

XLA fuses and tiles this like any conv; gradients (and double gradients,
needed nowhere but supported) come from autodiff instead of the
hand-written backward pass in op/upfirdn2d.py:19-142.

Layout is NHWC (TPU-native); channels ride the 128-lane dimension.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array

_DN = lax.conv_dimension_numbers  # cached below per-shape


def setup_fir_kernel(k: Union[Sequence[float], np.ndarray],
                     gain: float = 1.0) -> np.ndarray:
  """Normalize a 1-D (separable) or 2-D FIR kernel; multiply by gain.

  Mirrors reference models/up_or_down_sampling.py:181-188.
  """
  k = np.asarray(k, dtype=np.float32)
  if k.ndim == 1:
    k = np.outer(k, k)
  k = k / np.sum(k)
  assert k.ndim == 2
  return k * gain


def upfirdn2d(x: Array, kernel: Array, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0)) -> Array:
  """[B, H, W, C] -> upsample x`up`, pad, FIR-filter, downsample /`down`.

  Exact math of reference op/upfirdn2d.py:145-200 (same pad convention:
  ``pad[0]`` leading / ``pad[1]`` trailing on both spatial dims, negative
  values crop). Output spatial size:
  ``(size * up + pad0 + pad1 - k) // down + 1``.
  """
  return _upfirdn2d(x, jnp.asarray(kernel), up, up, down, down,
                    pad[0], pad[1], pad[0], pad[1])


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _upfirdn2d(x, kernel, up_x, up_y, down_x, down_y,
               pad_x0, pad_x1, pad_y0, pad_y1):
  b, h, w, c = x.shape
  kh, kw = kernel.shape
  # True convolution = correlation with the flipped kernel.
  k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
  # Depthwise: one shared 2-D tap bank applied per channel.
  rhs = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
  dn = lax.conv_dimension_numbers(x.shape, rhs.shape,
                                  ("NHWC", "HWIO", "NHWC"))
  out = lax.conv_general_dilated(
      x,
      rhs,
      window_strides=(down_y, down_x),
      padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
      lhs_dilation=(up_y, up_x),
      rhs_dilation=(1, 1),
      dimension_numbers=dn,
      feature_group_count=c,
  )
  return out


def naive_upsample_2d(x: Array, factor: int = 2) -> Array:
  """Nearest-neighbor upsample (up_or_down_sampling.py:59-63), NHWC."""
  b, h, w, c = x.shape
  x = x.reshape(b, h, 1, w, 1, c)
  x = jnp.broadcast_to(x, (b, h, factor, w, factor, c))
  return x.reshape(b, h * factor, w * factor, c)


def naive_downsample_2d(x: Array, factor: int = 2) -> Array:
  """Mean-pool downsample (up_or_down_sampling.py:66-69), NHWC."""
  b, h, w, c = x.shape
  x = x.reshape(b, h // factor, factor, w // factor, factor, c)
  return jnp.mean(x, axis=(2, 4))


import os

# Pallas FIR kernels win standalone on a v5e (down2 3.2x, up2 1.25x vs the
# dilated-conv form) but LOSE inside the fused train graph (uncsnpp train
# step: 1356 vs 1842 imgs/s) — pallas_call is a fusion barrier and the
# custom-VJP backward currently runs the conv path. Until the backward is
# a Pallas kernel and Mosaic fuses neighbors, the default inside models is
# the XLA path; set SOFT_TRUNCATION_PALLAS_FIR=1 to opt in.
_PALLAS_FIR = os.environ.get("SOFT_TRUNCATION_PALLAS_FIR", "0") == "1"
_PALLAS_VMEM_BUDGET = 2 * 1024 * 1024  # per-block floats budget heuristic


def _pallas_fir_ok(x, k) -> bool:
  if not _PALLAS_FIR:
    return False
  k = np.asarray(k)
  if k.ndim != 1:
    return False
  _, h, w, c = x.shape
  if h * w * min(c, 128) * 4 * 8 > _PALLAS_VMEM_BUDGET * 8:
    return False
  from .pallas.fir import pallas_available
  return pallas_available()


def upsample_2d(x: Array, k=None, factor: int = 2, gain: float = 1.0) -> Array:
  """FIR upsample by ``factor`` (up_or_down_sampling.py:195-224), NHWC.

  2x separable kernels route to the Pallas polyphase kernel on TPU
  (ops/pallas/fir.py); everything else uses the dilated-conv form.
  """
  if k is None:
    k = [1.0] * factor
  if factor == 2 and _pallas_fir_ok(x, k):
    from .pallas.fir import fir_upsample2_pallas
    return fir_upsample2_pallas(x, k, gain=gain)
  k = setup_fir_kernel(k, gain * (factor ** 2))
  p = k.shape[0] - factor
  return upfirdn2d(x, k, up=factor,
                   pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x: Array, k=None, factor: int = 2, gain: float = 1.0) -> Array:
  """FIR downsample by ``factor`` (up_or_down_sampling.py:227-257), NHWC.

  2x separable kernels route to the Pallas polyphase kernel on TPU.
  """
  if k is None:
    k = [1.0] * factor
  if factor == 2 and _pallas_fir_ok(x, k):
    from .pallas.fir import fir_downsample2_pallas
    return fir_downsample2_pallas(x, k, gain=gain)
  k = setup_fir_kernel(k, gain)
  p = k.shape[0] - factor
  return upfirdn2d(x, k, down=factor, pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(x: Array, w: Array, k=None, factor: int = 2,
                     gain: float = 1.0) -> Array:
  """Fused zero-insertion upsample + conv + FIR (StyleGAN2).

  ``w`` is HWIO ``[kh, kw, inC, outC]``. Matches the INTENDED semantics of
  reference up_or_down_sampling.py:72-141 (as released that function
  crashes: torch rejects its negative-step kernel flip at :126; see
  tools/make_ops_goldens.py). Implemented as one dilated correlation
  followed by the FIR pass — no conv_transpose needed on TPU.
  """
  assert w.ndim == 4
  kh, kw_, in_c, out_c = w.shape
  assert kh == kw_
  if k is None:
    k = [1.0] * factor
  k = setup_fir_kernel(k, gain * (factor ** 2))
  p = (k.shape[0] - factor) - (kh - 1)

  # Full correlation over the zero-inserted input: output (H-1)f + kh.
  dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
  y = lax.conv_general_dilated(
      x, w.astype(x.dtype),
      window_strides=(1, 1),
      padding=((kh - 1, kh - 1), (kh - 1, kh - 1)),
      lhs_dilation=(factor, factor),
      dimension_numbers=dn,
  )
  return upfirdn2d(y, k, pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(x: Array, w: Array, k=None, factor: int = 2,
                       gain: float = 1.0) -> Array:
  """Fused FIR + conv + downsample (up_or_down_sampling.py:144-178).

  ``w`` is HWIO ``[kh, kw, inC, outC]``.
  """
  assert w.ndim == 4
  kh = w.shape[0]
  if k is None:
    k = [1.0] * factor
  k = setup_fir_kernel(k, gain)
  p = (k.shape[0] - factor) + (kh - 1)
  y = upfirdn2d(x, k, pad=((p + 1) // 2, p // 2))
  dn = lax.conv_dimension_numbers(y.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
  return lax.conv_general_dilated(
      y, w.astype(x.dtype),
      window_strides=(factor, factor),
      padding="VALID",
      dimension_numbers=dn,
  )
