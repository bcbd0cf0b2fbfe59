"""ctypes bindings + auto-build for the native batch assembler.

The shared library is compiled on first use with g++ -O3 (cached beside
the source); if no toolchain is present, callers fall back to the numpy
implementation in NativeBatcher._assemble_numpy — identical semantics.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "batcher.cpp")
_LIB = os.path.join(_HERE, "libstbatcher.so")

FLAG_RANDOM_FLIP = 1
FLAG_UNIFORM_DEQUANT = 2
FLAG_CENTERED = 4

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
  global _build_failed
  if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                  < os.path.getmtime(_SRC)):
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    try:
      subprocess.run(cmd, check=True, capture_output=True, text=True)
      log.info("built %s", _LIB)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
      log.warning("native batcher build failed (%s); using numpy fallback",
                  e)
      _build_failed = True
      return None
  lib = ctypes.CDLL(_LIB)
  lib.st_assemble_batch.argtypes = [
      ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
      ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
      ctypes.c_int64, ctypes.c_int, ctypes.c_uint64,
      ctypes.POINTER(ctypes.c_float), ctypes.c_int]
  lib.st_assemble_batch.restype = None
  lib.st_shuffle_indices.argtypes = [ctypes.POINTER(ctypes.c_int64),
                                     ctypes.c_int64, ctypes.c_uint64]
  lib.st_shuffle_indices.restype = None
  return lib


def get_lib() -> Optional[ctypes.CDLL]:
  global _lib
  with _lock:
    if _lib is None and not _build_failed:
      _lib = _build()
    return _lib


class NativeBatcher:
  """Epoch-shuffled batch iterator over a resident uint8 dataset.

  Fuses gather + random flip + uniform dequantization + [0,1]->[-1,1]
  scaling in native code (or the numpy fallback). Alternative to the
  tf.data pipeline: config.data.pipeline = 'native'.
  """

  def __init__(self, images_uint8: np.ndarray, batch_size: int,
               random_flip: bool = True, uniform_dequant: bool = False,
               centered: bool = False, seed: int = 0,
               num_threads: Optional[int] = None,
               force_numpy: bool = False):
    assert images_uint8.dtype == np.uint8 and images_uint8.ndim == 4
    self.data = np.ascontiguousarray(images_uint8)
    self.batch_size = batch_size
    self.flags = ((FLAG_RANDOM_FLIP if random_flip else 0)
                  | (FLAG_UNIFORM_DEQUANT if uniform_dequant else 0)
                  | (FLAG_CENTERED if centered else 0))
    self.seed = seed
    self.num_threads = num_threads or min(16, os.cpu_count() or 1)
    self._lib = None if force_numpy else get_lib()
    self._indices = np.arange(len(self.data), dtype=np.int64)
    self._pos = len(self.data)  # trigger shuffle on first batch
    self._epoch = 0
    self._batch_counter = 0

  def _reshuffle(self):
    self._epoch += 1
    if self._lib is not None:
      self._lib.st_shuffle_indices(
          self._indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
          len(self._indices), self.seed + self._epoch)
    else:
      np.random.RandomState(self.seed + self._epoch).shuffle(self._indices)
    self._pos = 0

  def __iter__(self):
    return self

  def __next__(self) -> np.ndarray:
    if self._pos + self.batch_size > len(self._indices):
      self._reshuffle()
    idx = self._indices[self._pos:self._pos + self.batch_size]
    self._pos += self.batch_size
    self._batch_counter += 1
    seed = (self.seed + 1) * 1_000_003 + self._batch_counter * 65_537
    return self.assemble(idx, seed)

  def assemble(self, idx: np.ndarray, seed: int) -> np.ndarray:
    n, h, w, c = self.data.shape
    out = np.empty((len(idx), h, w, c), dtype=np.float32)
    if self._lib is not None:
      idx = np.ascontiguousarray(idx, dtype=np.int64)
      self._lib.st_assemble_batch(
          self.data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
          n, h, w, c,
          idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
          len(idx), self.flags, seed,
          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
          self.num_threads)
      return out
    return self._assemble_numpy(idx, seed, out)

  def _assemble_numpy(self, idx, seed, out) -> np.ndarray:
    """Reference semantics of the C++ kernel (slow path / ground truth for
    behavior, not bit-exactness: RNG streams differ)."""
    rng = np.random.RandomState(seed % (2 ** 31))
    batch = self.data[idx].astype(np.float32) / 255.0
    if self.flags & FLAG_RANDOM_FLIP:
      flips = rng.randint(0, 2, size=len(idx)).astype(bool)
      batch[flips] = batch[flips, :, ::-1, :]
    if self.flags & FLAG_UNIFORM_DEQUANT:
      batch = (255.0 * batch + rng.uniform(size=batch.shape)) / 256.0
    if self.flags & FLAG_CENTERED:
      batch = batch * 2.0 - 1.0
    out[...] = batch
    return out
