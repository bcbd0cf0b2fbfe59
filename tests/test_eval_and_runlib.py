"""Metric math tests + full train/eval pipeline smoke on synthetic data."""

import math
import os
import tempfile

import jax
import numpy as np
import pytest

from soft_truncation_tpu.eval.metrics import (compute_stats,
                                              frechet_distance,
                                              frechet_distance_jax,
                                              inception_score_from_probs,
                                              kernel_distance)


def test_frechet_distance_identical_is_zero():
  rng = np.random.RandomState(0)
  f = rng.normal(size=(500, 16))
  mu, cov = compute_stats(f)
  assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_rank_deficient_does_not_raise():
  """Far fewer samples than feature dims (rank-deficient covariance
  product with a large imaginary sqrtm component): must regularize and
  return a finite value instead of aborting a long eval run (the
  reference, cleanfid/fid.py:66-71, raises here)."""
  rng = np.random.RandomState(0)
  mu1, cov1 = compute_stats(rng.normal(size=(8, 256)))
  mu2, cov2 = compute_stats(rng.normal(loc=0.2, size=(8, 256)))
  fid = frechet_distance(mu1, cov1, mu2, cov2)
  assert np.isfinite(fid) and fid > 0


def test_frechet_distance_nonfinite_raises():
  """Degenerate inputs whose sqrtm stays non-finite after the
  eps-regularized retry must fail LOUD (ValueError), never return a
  silent NaN/inf FID at the end of a long eval run (reference fail-loud
  behavior: cleanfid/fid.py:66-71)."""
  d = 16
  mu = np.zeros(d)
  bad = np.eye(d)
  bad[0, 0] = np.nan  # non-finite covariance: no retry can fix this
  with pytest.raises(ValueError):
    frechet_distance(mu, bad, mu, np.eye(d))


def test_frechet_distance_known_value():
  """For isotropic Gaussians: FID = |mu1-mu2|^2 + D(s1 + s2 - 2 sqrt(s1 s2))."""
  d = 8
  mu1, mu2 = np.zeros(d), np.full(d, 0.5)
  s1, s2 = np.eye(d) * 2.0, np.eye(d) * 0.5
  got = frechet_distance(mu1, s1, mu2, s2)
  expect = d * 0.25 + d * (2.0 + 0.5 - 2 * math.sqrt(1.0))
  assert got == pytest.approx(expect, rel=1e-6)


def test_frechet_distance_jax_matches_scipy():
  rng = np.random.RandomState(1)
  f1 = rng.normal(size=(800, 12))
  f2 = rng.normal(loc=0.3, size=(800, 12))
  mu1, c1 = compute_stats(f1)
  mu2, c2 = compute_stats(f2)
  ref = frechet_distance(mu1, c1, mu2, c2)
  got = float(frechet_distance_jax(mu1, c1, mu2, c2))
  assert got == pytest.approx(ref, rel=2e-2)


def test_kernel_distance_sanity():
  rng = np.random.RandomState(2)
  f1 = rng.normal(size=(400, 8))
  f2 = rng.normal(size=(400, 8))
  f3 = rng.normal(loc=2.0, size=(400, 8))
  near = kernel_distance(f1, f2, num_subsets=10, max_subset_size=200)
  far = kernel_distance(f1, f3, num_subsets=10, max_subset_size=200)
  assert far > near
  assert abs(near) < 1.0


def test_inception_score_bounds():
  # uniform predictions -> IS == 1; one-hot diverse -> IS == num_classes
  n, k = 1000, 10
  uniform = np.full((n, k), 1.0 / k)
  assert inception_score_from_probs(uniform) == pytest.approx(1.0, rel=1e-5)
  onehot = np.eye(k)[np.arange(n) % k] * 0.9999 + 1e-5
  assert inception_score_from_probs(onehot) > 5.0


def _pipeline_config():
  from soft_truncation_tpu.configs.base import default_config, override
  config = default_config("cifar10")
  override(config, {
      "training": dict(sde="vpsde", continuous=True, reduce_mean=True,
                       st=True, k=1.0, likelihood_weighting=False,
                       truncation_time=1e-5, batch_size=16, n_iters=3,
                       snapshot_freq=1000, snapshot_freq_for_preemption=2,
                       log_freq=1, eval_freq=1, snapshot_sampling=False),
      "optim": dict(num_micro_batch=1, warmup=2),
      "sampling": dict(method="pc", predictor="euler_maruyama",
                       corrector="none", batch_size=8, snr=0.16,
                       n_steps_each=1, noise_removal=True,
                       probability_flow=False),
      "eval": dict(batch_size=8, enable_bpd=True, enable_sampling=True,
                   num_samples=64, nelbo_iter=1, nll_iter=1, residual=True,
                   lambda_=0.0, probability_flow=True),
      "data": dict(image_size=8, centered=True),
      "model": dict(
          name="ncsnpp", scale_by_sigma=False, ema_rate=0.999,
          normalization="GroupNorm", nonlinearity="swish", nf=8,
          ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(4,),
          resamp_with_conv=True, conditional=True, fir=False,
          fir_kernel=[1, 3, 3, 1], skip_rescale=True,
          resblock_type="biggan", progressive="none",
          progressive_input="none", progressive_combine="sum",
          init_scale=0.0, embedding_type="fourier", fourier_scale=16,
          num_scales=20),
  })
  return config


def test_feature_cache_invalidates_on_extractor_change(tmp_path):
  """Per-shard feature caches are keyed by the extractor fingerprint:
  swapping Inception weights must recompute, not return stale features
  (round-4 bug class: regenerated He-init npz + leftover LeCun-era
  statistics_*.npz silently mixed feature spaces). Legacy caches without
  a fingerprint stay trusted (resumability of pre-existing runs)."""
  from soft_truncation_tpu.eval.inception import DummyFeatureExtractor
  from soft_truncation_tpu.eval.sampling_io import get_dir_name, get_latents

  config = _pipeline_config()
  rng = np.random.RandomState(0)
  imgs = rng.randint(0, 256, (4, 8, 8, 3)).astype(np.uint8)
  ext16 = DummyFeatureExtractor(feature_dim=16)
  ext8 = DummyFeatureExtractor(feature_dim=8)
  assert ext16.fingerprint != ext8.fingerprint

  # in production begin_samples creates the shard dir before get_latents
  os.makedirs(get_dir_name(config, str(tmp_path), 0), exist_ok=True)
  f1, _ = get_latents(config, imgs, ext16, 0, 0, str(tmp_path))
  assert f1.shape[1] == 16
  # same fingerprint -> cache hit (garbage input proves it wasn't rerun)
  f2, _ = get_latents(config, np.zeros_like(imgs), ext16, 0, 0,
                      str(tmp_path))
  np.testing.assert_array_equal(f1, f2)
  # different fingerprint -> recomputed under the new extractor
  f3, _ = get_latents(config, imgs, ext8, 0, 0, str(tmp_path))
  assert f3.shape[1] == 8
  # legacy cache (no fingerprint key) is trusted as-is
  stat = os.path.join(get_dir_name(config, str(tmp_path), 0),
                      "statistics_1.npz")
  np.savez_compressed(stat, pool_3=np.ones((4, 3), np.float32))
  f4, p4 = get_latents(config, imgs, ext16, 0, 1, str(tmp_path))
  assert f4.shape == (4, 3) and p4 is None


def test_real_stats_cache_invalidates_on_extractor_change(tmp_path):
  """compute_dataset_stats' mu/cov cache is fingerprint-keyed too."""
  from soft_truncation_tpu.eval.evaluation import compute_dataset_stats
  from soft_truncation_tpu.eval.inception import DummyFeatureExtractor

  config = _pipeline_config()

  class _DS:
    def as_numpy_iterator(self):
      rng = np.random.RandomState(1)
      while True:
        yield {"image": rng.rand(8, 8, 8, 3).astype(np.float32)}

  cache = str(tmp_path / "real_stats.npz")
  ext16 = DummyFeatureExtractor(feature_dim=16)
  mu1, _ = compute_dataset_stats(config, _DS(), ext16, 16, cache_path=cache)
  assert mu1.shape == (16,)
  # same extractor: cache hit
  mu2, _ = compute_dataset_stats(config, _DS(), ext16, 16, cache_path=cache)
  np.testing.assert_array_equal(np.asarray(mu1), np.asarray(mu2))
  # different weights: recomputed at the new feature dim
  mu3, _ = compute_dataset_stats(config, _DS(),
                                 DummyFeatureExtractor(feature_dim=8), 16,
                                 cache_path=cache)
  assert mu3.shape == (8,)


def test_double_buffer_persists_inflight_shard_on_error():
  """Double-buffering dispatches shard r+1 before shard r's host work; if
  featurize/IO for shard r raises, shard r+1's completed device work must
  still land on disk (resume then skips it instead of re-paying minutes of
  sampler time)."""
  from soft_truncation_tpu.data import get_data_inverse_scaler
  from soft_truncation_tpu.eval import evaluation, sampling_io
  from soft_truncation_tpu.models import create_model
  from soft_truncation_tpu.sample import get_sampling_fn
  from soft_truncation_tpu.sde import get_sde

  config = _pipeline_config()
  sde = get_sde(config)
  model = create_model(config)
  x = np.zeros((2, 8, 8, 3), np.float32)
  params = model.init({"params": jax.random.PRNGKey(0)}, x,
                      np.ones((2,), np.float32), train=False)["params"]
  shape = (config.sampling.batch_size, 8, 8, 3)
  sampling_fn = get_sampling_fn(config, sde, shape,
                                get_data_inverse_scaler(config),
                                config.sampling.truncation_time)

  class FailingExtractor:
    name = "failing"
    softmax = False
    def __call__(self, imgs):
      raise RuntimeError("featurize blew up")

  with tempfile.TemporaryDirectory() as sample_dir:
    with pytest.raises(RuntimeError, match="featurize blew up"):
      evaluation.compute_fid_and_is(
          config, model, params, sampling_fn, step=1,
          sample_dir=sample_dir, assetdir=None,
          num_data=2 * config.sampling.batch_size,
          extractor=FailingExtractor())
    dir_name = sampling_io.get_dir_name(config, sample_dir, 1)
    # shard 0 was written by finish_samples before featurize raised; the
    # in-flight shard 1 must have been persisted by the cleanup path
    assert os.path.exists(os.path.join(dir_name, "samples_0.npz"))
    assert os.path.exists(os.path.join(dir_name, "samples_1.npz"))


def test_run_lib_train_and_evaluate_smoke():
  """Full train (3 steps, synthetic data, checkpoints) then evaluate
  (bpd + sampling + FID with the dummy extractor)."""
  from soft_truncation_tpu import run_lib

  config = _pipeline_config()
  with tempfile.TemporaryDirectory() as workdir:
    state = run_lib.train(config, workdir, assetdir=None)
    # the loop is range(0, n_iters + 1) like the reference (run_lib.py:70)
    assert int(state.step) == 4
    # preemption checkpoint written at step 2
    # functional tensorboard writer (the reference's dir is dead code)
    tb_events = [f for f in os.listdir(os.path.join(workdir, "tensorboard"))
                 if "tfevents" in f]
    assert tb_events, "no tensorboard event file written"
    assert os.path.exists(os.path.join(workdir, "checkpoints-meta",
                                       "checkpoint"))
    # resume: train again — should restore and continue from the checkpoint
    state2 = run_lib.train(config, workdir, assetdir=None)
    assert int(state2.step) >= 4

    results = run_lib.evaluate(config, workdir, assetdir=None)
    assert "nelbo_bpd_mean" in results
    assert "nll_bpd_mean" in results
    assert "fid" in results
    assert np.isfinite(results["fid"])
    assert np.isfinite(results["nll_bpd_mean"])


def test_honor_jax_platforms_env(monkeypatch):
  """main.py must re-assert JAX_PLATFORMS from env: the managed runtime's
  sitecustomize forces jax_platforms='axon,cpu' at interpreter start
  (axon/register/pjrt.py:86), silently overriding the user's env var —
  'CPU' CLI runs were executing on the TPU until this hook."""
  import jax
  from soft_truncation_tpu import main as main_mod

  calls = []
  monkeypatch.setattr(jax.config, "update",
                      lambda k, v: calls.append((k, v)))
  monkeypatch.setenv("JAX_PLATFORMS", "cpu")
  main_mod._honor_jax_platforms_env()
  assert ("jax_platforms", "cpu") in calls

  calls.clear()
  monkeypatch.delenv("JAX_PLATFORMS")
  main_mod._honor_jax_platforms_env()
  assert calls == []
