"""cleanfid-surface API: folder features, FID/KID between folders, caching."""

import os
import tempfile

import numpy as np
import pytest

from soft_truncation_tpu.eval.cleanfid_api import (compute_fid, compute_kid,
                                                   get_folder_features)
from soft_truncation_tpu.eval.inception import (DummyFeatureExtractor,
                                                clean_resize)


def _write_shards(d, seed, n_shards=2, n=32):
  rng = np.random.RandomState(seed)
  for i in range(n_shards):
    samples = rng.randint(0, 256, size=(n, 8, 8, 3), dtype=np.uint8)
    np.savez_compressed(os.path.join(d, f"samples_{i}.npz"),
                        samples=samples)


def test_folder_features_and_cache():
  ex = DummyFeatureExtractor()
  with tempfile.TemporaryDirectory() as d:
    _write_shards(d, 0)
    feats = get_folder_features(d, ex)
    assert feats.shape == (64, ex.feature_dim)
    assert os.path.exists(os.path.join(d, f"features_{ex.name}.npz"))
    again = get_folder_features(d, ex)
    np.testing.assert_array_equal(feats, again)


def test_fid_self_is_zero_and_symmetryish():
  ex = DummyFeatureExtractor()
  with tempfile.TemporaryDirectory() as d1, \
       tempfile.TemporaryDirectory() as d2, \
       tempfile.TemporaryDirectory() as d3:
    _write_shards(d1, 0, n=64)
    _write_shards(d2, 0, n=64)   # identical distribution (same seed)
    _write_shards(d3, 99, n=64)
    fid_same = compute_fid(fdir1=d1, fdir2=d2, extractor=ex)
    fid_diff = compute_fid(fdir1=d1, fdir2=d3, extractor=ex)
    assert fid_same == pytest.approx(0.0, abs=1e-6)
    assert fid_diff > 0.0


def test_kid_between_folders():
  ex = DummyFeatureExtractor()
  with tempfile.TemporaryDirectory() as d1, \
       tempfile.TemporaryDirectory() as d2:
    _write_shards(d1, 1, n=64)
    _write_shards(d2, 2, n=64)
    kid = compute_kid(d1, fdir2=d2, extractor=ex)
    assert np.isfinite(kid)


def test_clean_resize_properties():
  rng = np.random.RandomState(0)
  imgs = rng.randint(0, 256, size=(2, 16, 16, 3), dtype=np.uint8)
  out = clean_resize(imgs, size=32)
  assert out.shape == (2, 32, 32, 3)
  assert out.dtype == np.float32
  # constant image stays constant under bicubic resize
  const = np.full((1, 16, 16, 3), 100, dtype=np.uint8)
  out_c = clean_resize(const, size=32)
  np.testing.assert_allclose(out_c, 100.0, rtol=1e-5)
