"""Feature extraction for FID/IS: backend registry + clean-resize parity.

The reference uses two host-side pipelines: TF-Hub Inception v1 split
across GPUs (evaluation.py:36-163) and cleanfid's torchscript InceptionV3
(cleanfid/features.py:13-98). Both need network downloads. This module
exposes one interface with source resolution:

  1. 'flax'  — on-device InceptionV3 (eval/inception_v3.py) with weights
               from <assetdir>/inception_v3_weights.npz (converted once via
               tools/convert_inception_weights.py on a machine with the
               torchscript file)
  2. 'tfhub' — the reference's TF-Hub models when the environment has them
               cached
  3. 'dummy' — a deterministic random-projection extractor so the FID
               pipeline is exercisable (tests, data-less smoke runs);
               NEVER valid for reported numbers and says so loudly.

Clean-mode resize parity: cleanfid resizes with PIL bicubic per channel in
float32 (cleanfid/resize.py:20-53) — reproduced bit-for-bit here since FID
is sensitive to the resize kernel.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)

INCEPTION_DEFAULT_IMAGE_SIZE = 299


def clean_resize(images: np.ndarray, size: int = 299) -> np.ndarray:
  """cleanfid 'clean' resize: PIL bicubic per channel on float32 arrays.

  images: [N, H, W, C] uint8 or float in [0, 255]. Returns float32
  [N, size, size, C] (NOT renormalized — cleanfid feeds raw-range floats).
  """
  from PIL import Image

  images = np.asarray(images)
  n, h, w, c = images.shape
  out = np.empty((n, size, size, c), dtype=np.float32)
  for i in range(n):
    for ch in range(c):
      img = Image.fromarray(images[i, :, :, ch].astype(np.float32),
                            mode="F")
      img = img.resize((size, size), resample=Image.BICUBIC)
      out[i, :, :, ch] = np.asarray(img, dtype=np.float32)
  return out


class FeatureExtractor:
  """Maps uint8 images [N,H,W,C] -> (features [N,D], probs [N,K] | None).

  ``fingerprint`` identifies the exact feature map (backend AND weights):
  cached per-shard feature npz files are keyed by it so swapping the
  Inception weights (e.g. regenerating the random-init npz) invalidates
  stale caches instead of silently mixing old sample features with new
  real-side statistics (a bug class hit in round 4 — the He-init
  regeneration left LeCun-era statistics_*.npz behind)."""

  name = "base"
  feature_dim = 2048
  fingerprint = "base"

  def __call__(self, images_uint8: np.ndarray):
    raise NotImplementedError


class DummyFeatureExtractor(FeatureExtractor):
  """Deterministic random projection of downsampled images. For tests and
  smoke runs only — FID values are internally consistent but meaningless
  against published numbers."""

  name = "dummy"

  def __init__(self, feature_dim: int = 16, num_classes: int = 10):
    self.feature_dim = feature_dim
    self.num_classes = num_classes
    self.fingerprint = f"dummy:{feature_dim}x{num_classes}"
    rng = np.random.RandomState(0)
    self._proj = rng.normal(0, 1, size=(16 * 16 * 3, feature_dim)) \
        .astype(np.float32)
    self._cls = rng.normal(0, 1, size=(feature_dim, num_classes)) \
        .astype(np.float32)
    log.warning("DummyFeatureExtractor in use — FID/IS values are NOT "
                "comparable to published numbers.")

  def __call__(self, images_uint8: np.ndarray):
    x = jnp.asarray(images_uint8, jnp.float32) / 127.5 - 1.0
    n = x.shape[0]
    c = x.shape[-1]
    x = jax.image.resize(x, (n, 16, 16, c), "linear")
    if c == 1:
      x = jnp.tile(x, (1, 1, 1, 3))
    feats = x.reshape(n, -1) @ jnp.asarray(self._proj)
    logits = jnp.tanh(feats) @ jnp.asarray(self._cls)
    probs = jax.nn.softmax(logits, axis=-1)
    return np.asarray(feats), np.asarray(probs)


class FlaxInceptionExtractor(FeatureExtractor):
  """On-device InceptionV3 (pytorch-FID weights) — pool3 features + logits.

  resize_mode:
    'host'   — cleanfid's PIL bicubic per-channel float32 resize
               (bit-parity with the reference, cleanfid/resize.py:20-53)
               run on the host. On a 1-core host this costs ~20 ms/img
               (measured) — it GATES 50k-scale featurization.
    'device' — jax.image.resize 'cubic' inside the jitted program, fed
               raw uint8 (350x less tunnel transfer than f32 299²).
               For UPSCALING both are the same Keys a=-0.5 bicubic at
               half-pixel coords: measured max |delta| 4.7e-4 on the
               [0,255] range vs PIL (tests/test_inception_parity.py) —
               far below FID sensitivity. Auto-falls back to 'host' for
               inputs >= 299 px, where PIL's downscale antialiasing has
               no exact jax twin.
  """

  name = "flax"

  def __init__(self, weights_path: str, batch_size: int = 128,
               resize_mode: str = "host"):
    from .inception_v3 import InceptionV3, load_params_npz
    assert resize_mode in ("host", "device")
    self.model = InceptionV3()
    self.params = load_params_npz(weights_path)
    self.batch_size = batch_size
    self.resize_mode = resize_mode
    # weights-content fingerprint (not path/mtime): regenerated npz files
    # must invalidate per-shard feature caches (~0.2s once per process)
    import hashlib
    h = hashlib.md5()
    with open(weights_path, "rb") as f:
      for chunk in iter(lambda: f.read(1 << 22), b""):
        h.update(chunk)
    self.fingerprint = f"flax:{h.hexdigest()[:12]}"
    s = INCEPTION_DEFAULT_IMAGE_SIZE

    @jax.jit
    def _run(x):
      return self.model.apply({"params": self.params}, x)

    @jax.jit
    def _run_uint8(x_u8):
      x = x_u8.astype(jnp.float32)
      n, _, _, c = x.shape
      x = jax.image.resize(x, (n, s, s, c), "cubic")
      return self.model.apply({"params": self.params}, x)

    self._run = _run
    self._run_uint8 = _run_uint8

  def __call__(self, images_uint8: np.ndarray):
    # cleanfid pipeline: clean-resize raw-range floats, then the network
    # normalizes internally (cleanfid/features.py InceptionV3W semantics)
    device = (self.resize_mode == "device"
              and images_uint8.shape[1] < INCEPTION_DEFAULT_IMAGE_SIZE
              and images_uint8.shape[2] < INCEPTION_DEFAULT_IMAGE_SIZE)
    feats, probs = [], []
    for i in range(0, len(images_uint8), self.batch_size):
      chunk = images_uint8[i:i + self.batch_size]
      if device:
        f, p = self._run_uint8(jnp.asarray(chunk))
      else:
        f, p = self._run(jnp.asarray(
            clean_resize(chunk, INCEPTION_DEFAULT_IMAGE_SIZE)))
      feats.append(np.asarray(f))
      probs.append(np.asarray(p))
    return np.concatenate(feats), np.concatenate(probs)


INCEPTION_TFHUB = "https://tfhub.dev/tensorflow/tfgan/eval/inception/1"
INCEPTION_V3_TFHUB = (
    "https://tfhub.dev/google/imagenet/inception_v3/feature_vector/4")


class TFHubInceptionExtractor(FeatureExtractor):
  """The reference's TF-Hub pipeline (reference evaluation.py:36-163):
  tfgan Inception v1 (pool_3 + logits) for <256px datasets, Inception v3
  feature_vector for >=256px. Requires tensorflow_hub with the module
  already in TFHUB_CACHE_DIR (zero-egress environments can pre-seed it).
  """

  name = "tfhub"

  def __init__(self, inceptionv3: bool = False, batch_size: int = 128):
    import tensorflow as tf
    import tensorflow_hub as tfhub
    self._tf = tf
    self.inceptionv3 = inceptionv3
    self.batch_size = batch_size
    self.fingerprint = f"tfhub:{'v3' if inceptionv3 else 'tfgan'}"
    self.model = tfhub.load(
        INCEPTION_V3_TFHUB if inceptionv3 else INCEPTION_TFHUB)

  def __call__(self, images_uint8: np.ndarray):
    tf = self._tf
    feats, probs = [], []
    for i in range(0, len(images_uint8), self.batch_size):
      x = tf.convert_to_tensor(images_uint8[i:i + self.batch_size])
      if self.inceptionv3:  # reference evaluation.py:112-115
        x = tf.cast(x, tf.float32) / 255.0
        feats.append(np.asarray(self.model(x)))
      else:
        x = (tf.cast(x, tf.float32) - 127.5) / 127.5
        out = self.model(x)
        feats.append(np.asarray(tf.reshape(out["pool_3"],
                                           (x.shape[0], -1))))
        logits = np.asarray(tf.reshape(out["logits"], (x.shape[0], -1)))
        probs.append(np.exp(logits - logits.max(axis=1, keepdims=True)))
    feats = np.concatenate(feats)
    if probs:
      probs = np.concatenate(probs)
      probs = probs / probs.sum(axis=1, keepdims=True)
      return feats, probs
    return feats, None


def _tfhub_module_cached() -> bool:
  """True only when tensorflow_hub is importable AND a module cache dir
  exists — the tfhub backend is gated on this probe so zero-egress
  environments never attempt a download."""
  try:
    import tensorflow_hub  # noqa: F401
  except ImportError:
    return False
  cache = os.environ.get("TFHUB_CACHE_DIR", "/tmp/tfhub_modules")
  return os.path.isdir(cache) and bool(os.listdir(cache))


def get_feature_extractor(config, assetdir: Optional[str] = None,
                          allow_dummy: bool = True) -> FeatureExtractor:
  """Resolve the best available backend (see module docstring)."""
  if assetdir:
    weights = os.path.join(assetdir, "inception_v3_weights.npz")
    if os.path.exists(weights):
      try:
        tpu_cfg = config.get("tpu") if hasattr(config, "get") else None
        mode = (tpu_cfg.get("fid_resize", "host")
                if tpu_cfg is not None else "host")
        return FlaxInceptionExtractor(weights, resize_mode=mode)
      except Exception as e:  # pragma: no cover
        log.warning("flax inception unavailable: %s", e)
  if _tfhub_module_cached():  # pragma: no cover - needs cached modules
    try:
      return TFHubInceptionExtractor(
          inceptionv3=config.data.image_size >= 256)
    except Exception as e:
      log.warning("tfhub inception unavailable: %s", e)
  if allow_dummy:
    return DummyFeatureExtractor()
  raise RuntimeError(
      "No Inception backend available: provide "
      "<assetdir>/inception_v3_weights.npz (tools/"
      "convert_inception_weights.py), pre-seed TFHUB_CACHE_DIR, or "
      "enable the dummy extractor.")
