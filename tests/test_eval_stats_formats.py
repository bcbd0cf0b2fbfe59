"""Dataset-stats loading parity: the reference ecosystem's raw-pool_3 npz
format (reference evaluation.py:54-72,303-320), the rebuild's {mu,cov}
moment caches, the LSUN/STL10 name map, and KID reachability end-to-end."""

import os
import tempfile

import numpy as np
import pytest

from soft_truncation_tpu.configs.base import default_config
from soft_truncation_tpu.eval.evaluation import load_dataset_stats
from soft_truncation_tpu.eval.metrics import compute_stats, kernel_distance


def _cfg(dataset, image_size=32, category="bedroom"):
  config = default_config("cifar10")
  config.data.dataset = dataset
  config.data.image_size = image_size
  if dataset == "LSUN":
    config.data.category = category
  return config


def test_load_stats_pool3_format():
  """Reference assetdir npz carries raw pool_3 activations; loader must
  compute the moments and surface the raw features for KID."""
  rng = np.random.RandomState(0)
  feats = rng.normal(size=(300, 16)).astype(np.float32)
  with tempfile.TemporaryDirectory() as assetdir:
    np.savez(os.path.join(assetdir, "cifar10_stats.npz"), pool_3=feats)
    mu, cov, real = load_dataset_stats(_cfg("CIFAR10"), assetdir)
  want_mu, want_cov = compute_stats(feats)
  np.testing.assert_allclose(mu, want_mu, rtol=1e-6)
  np.testing.assert_allclose(cov, want_cov, rtol=1e-6)
  np.testing.assert_array_equal(real, feats)


def test_load_stats_pool3_4d_is_flattened():
  """tfgan pool_3 dumps can be [N, 1, 1, D]."""
  rng = np.random.RandomState(1)
  feats = rng.normal(size=(50, 1, 1, 8)).astype(np.float32)
  with tempfile.TemporaryDirectory() as assetdir:
    np.savez(os.path.join(assetdir, "imagenet32_stats.npz"), pool_3=feats)
    mu, cov, real = load_dataset_stats(_cfg("IMAGENET32"), assetdir)
  assert real.shape == (50, 8)
  assert mu.shape == (8,) and cov.shape == (8, 8)


def test_load_stats_moment_format():
  rng = np.random.RandomState(2)
  feats = rng.normal(size=(200, 8))
  mu0, cov0 = compute_stats(feats)
  with tempfile.TemporaryDirectory() as assetdir:
    np.savez(os.path.join(assetdir, "celeba_stats.npz"), mu=mu0, cov=cov0)
    mu, cov, real = load_dataset_stats(_cfg("CELEBA"), assetdir)
  np.testing.assert_allclose(mu, mu0)
  np.testing.assert_allclose(cov, cov0)
  assert real is None


def test_load_stats_sigma_alias_and_lsun_name():
  """cleanfid-style {mu, sigma} keys + the LSUN filename branch
  (reference evaluation.py:63)."""
  rng = np.random.RandomState(3)
  feats = rng.normal(size=(100, 4))
  mu0, cov0 = compute_stats(feats)
  with tempfile.TemporaryDirectory() as assetdir:
    np.savez(os.path.join(assetdir, "LSUN_church_outdoor_96_clean_stats.npz"),
             mu=mu0, sigma=cov0)
    mu, cov, real = load_dataset_stats(
        _cfg("LSUN", image_size=96, category="church_outdoor"), assetdir)
  np.testing.assert_allclose(cov, cov0)
  assert real is None


def test_load_stats_bad_keys_raises():
  with tempfile.TemporaryDirectory() as assetdir:
    np.savez(os.path.join(assetdir, "stl10_stats.npz"),
             something_else=np.zeros(3))
    with pytest.raises(KeyError):
      load_dataset_stats(_cfg("STL10", image_size=48), assetdir)


def test_load_stats_unknown_dataset_raises():
  with pytest.raises(ValueError):
    load_dataset_stats(_cfg("NOPE"), "/tmp")


def test_kid_exact_small_set():
  """kernel_distance with one full-set subset equals the unbiased MMD^2
  of the tfgan/cleanfid polynomial kernel (x.y/d + 1)^3 computed directly."""
  rng = np.random.RandomState(4)
  x = rng.normal(size=(40, 6))
  y = rng.normal(loc=0.5, size=(40, 6))
  got = kernel_distance(y, x, num_subsets=1, max_subset_size=40)
  d = x.shape[1]
  kxx = (x @ x.T / d + 1) ** 3
  kyy = (y @ y.T / d + 1) ** 3
  kxy = (x @ y.T / d + 1) ** 3
  m = 40
  want = ((kxx.sum() - np.trace(kxx)) / (m * (m - 1))
          + (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
          - 2 * kxy.mean())
  assert got == pytest.approx(want, rel=1e-9)


def test_kid_reachable_from_evaluate():
  """End-to-end: evaluate() with a pool_3-format assetdir npz must emit a
  finite KID alongside FID/IS (reference evaluation.py:319-320 parity)."""
  from test_eval_and_runlib import _pipeline_config
  from soft_truncation_tpu import run_lib

  config = _pipeline_config()
  rng = np.random.RandomState(5)
  # dummy extractor feature_dim is 16 — craft matching real features
  feats = rng.normal(size=(256, 16)).astype(np.float32)
  with tempfile.TemporaryDirectory() as workdir:
    assetdir = os.path.join(workdir, "assets")
    os.makedirs(assetdir)
    np.savez(os.path.join(assetdir, "cifar10_stats.npz"), pool_3=feats)
    run_lib.train(config, workdir, assetdir=None)
    results = run_lib.evaluate(config, workdir, assetdir=assetdir)
  assert "kid" in results and np.isfinite(results["kid"])
  assert "fid" in results and np.isfinite(results["fid"])
  assert "eval_loss_mean" in results
  assert np.isfinite(results["eval_loss_mean"])
