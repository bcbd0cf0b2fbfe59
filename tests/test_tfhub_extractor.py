"""TF-Hub Inception backend with a stubbed tensorflow_hub module.

The reference's CIFAR eval path runs entirely on the TF-Hub tfgan
Inception (reference evaluation.py:36-163); zero egress means the real
module can never load here, so everything except the download is covered
against a fake `tensorflow_hub.load` returning callables with the tfgan /
feature_vector output signatures: input normalization, pool_3/logits
reshaping, softmax normalization of probs, batching, the cache-dir probe,
and backend resolution in get_feature_extractor.
"""

import os
import sys
import types

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")


def _install_fake_tfhub(monkeypatch, calls):
  """Fake tensorflow_hub whose load() returns tfgan-signature (dict of
  pool_3/logits) or feature_vector-signature (plain tensor) callables."""
  from soft_truncation_tpu.eval.inception import (INCEPTION_TFHUB,
                                                  INCEPTION_V3_TFHUB)

  def fake_load(handle):
    calls.append(("load", handle))

    if handle == INCEPTION_TFHUB:
      def tfgan_model(x):
        calls.append(("tfgan", np.asarray(x)))
        n = int(x.shape[0])
        flat = tf.reshape(tf.cast(x, tf.float32), (n, -1))
        pool3 = tf.tile(tf.reduce_mean(flat, axis=1, keepdims=True),
                        (1, 2048))
        logits = tf.tile(
            tf.reduce_max(flat, axis=1, keepdims=True), (1, 1008)) \
            * tf.range(1008, dtype=tf.float32) / 1008.0
        return {"pool_3": tf.reshape(pool3, (n, 1, 1, 2048)),
                "logits": tf.reshape(logits, (n, 1, 1008))}
      return tfgan_model

    assert handle == INCEPTION_V3_TFHUB
    def fv_model(x):
      calls.append(("fv", np.asarray(x)))
      n = int(x.shape[0])
      flat = tf.reshape(tf.cast(x, tf.float32), (n, -1))
      return tf.tile(tf.reduce_mean(flat, axis=1, keepdims=True), (1, 2048))
    return fv_model

  fake = types.ModuleType("tensorflow_hub")
  fake.load = fake_load
  monkeypatch.setitem(sys.modules, "tensorflow_hub", fake)
  return fake


def test_tfgan_backend_pool3_logits(monkeypatch):
  from soft_truncation_tpu.eval.inception import TFHubInceptionExtractor

  calls = []
  _install_fake_tfhub(monkeypatch, calls)
  ext = TFHubInceptionExtractor(inceptionv3=False, batch_size=3)

  rng = np.random.RandomState(0)
  images = rng.randint(0, 256, size=(7, 32, 32, 3), dtype=np.uint8)
  feats, probs = ext(images)

  assert feats.shape == (7, 2048)
  assert probs.shape == (7, 1008)
  # probs renormalized from exp(logits - max): rows sum to 1
  np.testing.assert_allclose(probs.sum(axis=1), np.ones(7), rtol=1e-5)
  # batching: 7 images at batch_size 3 -> 3 model calls after load
  model_calls = [c for c in calls if c[0] == "tfgan"]
  assert [c[1].shape[0] for c in model_calls] == [3, 3, 1]
  # input normalization: uint8 -> (x - 127.5) / 127.5 in [-1, 1]
  # (reference evaluation.py:107-123 tfgan path)
  seen = model_calls[0][1]
  expected = (images[:3].astype(np.float32) - 127.5) / 127.5
  np.testing.assert_allclose(seen, expected, rtol=1e-6)
  # pool_3 reshaped from [n,1,1,2048]: equals mean of normalized pixels
  expected_all = ((images.astype(np.float32) - 127.5) / 127.5) \
      .reshape(7, -1).mean(axis=1)
  np.testing.assert_allclose(feats[:, 0], expected_all, rtol=1e-4)


def test_feature_vector_backend(monkeypatch):
  from soft_truncation_tpu.eval.inception import TFHubInceptionExtractor

  calls = []
  _install_fake_tfhub(monkeypatch, calls)
  ext = TFHubInceptionExtractor(inceptionv3=True, batch_size=4)

  rng = np.random.RandomState(1)
  images = rng.randint(0, 256, size=(4, 256, 256, 3), dtype=np.uint8)
  feats, probs = ext(images)

  assert feats.shape == (4, 2048)
  assert probs is None  # feature_vector module has no logits head
  # input normalization: x / 255 (reference evaluation.py:112-115)
  seen = [c for c in calls if c[0] == "fv"][0][1]
  np.testing.assert_allclose(seen, images.astype(np.float32) / 255.0,
                             rtol=1e-6)


def test_cache_probe(monkeypatch, tmp_path):
  from soft_truncation_tpu.eval import inception

  _install_fake_tfhub(monkeypatch, [])
  # empty/missing cache dir -> False (never attempt a download)
  monkeypatch.setenv("TFHUB_CACHE_DIR", str(tmp_path / "nope"))
  assert not inception._tfhub_module_cached()
  cache = tmp_path / "modules"
  cache.mkdir()
  monkeypatch.setenv("TFHUB_CACHE_DIR", str(cache))
  assert not inception._tfhub_module_cached()  # exists but empty
  (cache / "abc123").mkdir()
  assert inception._tfhub_module_cached()

  # without the module importable the probe must be False
  monkeypatch.setitem(sys.modules, "tensorflow_hub", None)
  assert not inception._tfhub_module_cached()


def test_backend_resolution_prefers_tfhub_when_cached(monkeypatch, tmp_path):
  """get_feature_extractor: with a seeded cache and no flax weights, the
  tfhub backend is selected; image_size >= 256 flips to the v3
  feature_vector module (reference evaluation.py:36-44)."""
  import ml_collections

  from soft_truncation_tpu.eval.inception import (TFHubInceptionExtractor,
                                                  get_feature_extractor)

  calls = []
  _install_fake_tfhub(monkeypatch, calls)
  cache = tmp_path / "modules"
  cache.mkdir()
  (cache / "abc123").mkdir()
  monkeypatch.setenv("TFHUB_CACHE_DIR", str(cache))

  config = ml_collections.ConfigDict()
  config.data = ml_collections.ConfigDict()
  config.data.image_size = 32
  ext = get_feature_extractor(config, assetdir=None)
  assert isinstance(ext, TFHubInceptionExtractor)
  assert not ext.inceptionv3

  config.data.image_size = 256
  ext = get_feature_extractor(config, assetdir=str(tmp_path))
  assert isinstance(ext, TFHubInceptionExtractor)
  assert ext.inceptionv3
