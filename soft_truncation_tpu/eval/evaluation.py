"""Evaluation orchestration: FID/KID/IS over sample shards, and bpd.

Parity target: reference evaluation.py:165-464 — without the hardcoded
lab-IP gates (evaluation.py:166-171) and with the dead metric-report
writes fixed (the reference's ``if not os.path.join(...)`` guards at
evaluation.py:224,260,333 are always False, so its report npz files were
never written; ours are).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import get_batch
from . import sampling_io
from .inception import get_feature_extractor
from .metrics import (compute_stats, frechet_distance,
                      inception_score_from_probs, kernel_distance)

log = logging.getLogger(__name__)


def load_dataset_stats(config, assetdir: str, mode: str = "clean"):
  """Pre-computed dataset statistics (reference evaluation.py:54-71).

  Returns ``(mu, cov, real_feats)``. The reference ecosystem's assetdir
  npz files carry the raw Inception ``pool_3`` activations (used directly
  by tfgan FID/KID, reference evaluation.py:303-320); the rebuild's own
  stat caches carry precomputed ``{mu, cov}`` moments. Both formats load:
  moments are computed from ``pool_3`` when absent, and ``real_feats`` is
  the raw feature matrix when available (required for KID) else None.
  """
  names = {
      "CIFAR10": "cifar10_stats.npz",
      "IMAGENET32": "imagenet32_stats.npz",
      "CELEBA": "celeba_stats.npz",
      "CelebAHQ": "celeba-hq.npz",
      "STL10": "stl10_stats.npz",
  }
  if config.data.dataset == "LSUN":
    filename = (f"LSUN_{config.data.category}_"
                f"{config.data.image_size}_{mode}_stats.npz")
  else:
    filename = names.get(config.data.dataset)
  if filename is None:
    raise ValueError(f"Dataset {config.data.dataset} stats not found.")
  path = os.path.join(assetdir, filename)
  with np.load(path) as stats:
    real_feats = None
    if "pool_3" in stats:
      real_feats = np.asarray(stats["pool_3"])
      if real_feats.ndim > 2:  # tfgan dumps can be [N, 1, 1, D]
        real_feats = real_feats.reshape(real_feats.shape[0], -1)
    if "mu" in stats:
      mu = np.asarray(stats["mu"])
      cov = np.asarray(stats["cov"] if "cov" in stats else stats["sigma"])
    elif real_feats is not None:
      mu, cov = compute_stats(real_feats)
    else:
      raise KeyError(
          f"{path} has neither (mu, cov|sigma) moments nor raw pool_3 "
          f"features; keys: {sorted(stats.files)}")
  return mu, cov, real_feats


def compute_dataset_stats(config, ds, extractor, num_data: int,
                          cache_path: Optional[str] = None):
  """Stream the real dataset through the extractor -> (mu, sigma), cached
  (cleanfid/fid.py:276-311 equivalent). The cache is keyed by the
  extractor's content fingerprint (see sampling_io.get_latents): stats
  computed under different weights are recomputed, not reused."""
  fp = getattr(extractor, "fingerprint", None)
  if cache_path and os.path.exists(cache_path):
    with np.load(cache_path) as f:
      cached_fp = str(f["fingerprint"]) if "fingerprint" in f.files else None
      if cached_fp is None or fp is None or cached_fp == fp:
        return f["mu"], f["cov"]
    log.info("real-stats cache %s was computed under extractor %s != %s — "
             "recomputing", cache_path, cached_fp, fp)
  feats = []
  seen = 0
  for batch in ds.as_numpy_iterator():
    imgs = np.clip(batch["image"] * 255.0, 0, 255).astype(np.uint8)
    f, _ = extractor(imgs)
    feats.append(f)
    seen += len(imgs)
    if seen >= num_data:
      break
  feats = np.concatenate(feats)[:num_data]
  mu, cov = compute_stats(feats)
  if cache_path:
    np.savez_compressed(cache_path, mu=mu, cov=cov,
                        **({"fingerprint": fp} if fp else {}))
  return mu, cov


def compute_fid_and_is(config, model, params, sampling_fn, step: int,
                       sample_dir: str, assetdir: str, num_data: int,
                       eval_ds=None, extractor=None, key=None) -> dict:
  """Sample -> featurize -> FID/KID/IS (reference evaluation.py:165-201).

  Sample shards and feature statistics are cached/resumable. Returns the
  metrics dict and writes a report npz next to the samples.
  """
  extractor = extractor or get_feature_extractor(config, assetdir)
  num_rounds = (num_data - 1) // config.sampling.batch_size + 1
  if key is None:
    key = jax.random.PRNGKey(config.seed)

  import time as _time
  t_start = _time.time()
  all_feats, all_probs = [], []
  # double-buffered: shard r+1's sampler is DISPATCHED (async) before
  # shard r's host work (fetch, npz/PNG writes, featurize) — the device
  # never idles waiting on host I/O. Measured on the tunneled v5e this
  # closed most of the 92 vs 140 imgs/s end-to-end/device-only gap
  # (benchmarks/ROOFLINE.md, FID-50k production run).
  pending = None  # (round_idx, begin_samples handle)
  inflight = {}  # round_idx -> dispatched-but-unpersisted handle
  try:
    for r in range(num_rounds + 1):
      if r < num_rounds:
        key, sub = jax.random.split(key)
        handle = sampling_io.begin_samples(config, model, params, sampling_fn,
                                           step, r, sample_dir, key=sub)
        inflight[r] = handle
      else:
        handle = None
      if pending is not None:
        rp, hp = pending
        samples = sampling_io.finish_samples(hp)
        inflight.pop(rp, None)
        feats, probs = sampling_io.get_latents(config, samples, extractor,
                                               step, rp, sample_dir)
        all_feats.append(feats)
        if probs is not None:
          all_probs.append(probs)
        if rp % 25 == 0 or rp == num_rounds - 1:
          done = (rp + 1) * config.sampling.batch_size
          dt = _time.time() - t_start
          log.info("sampling shard %d/%d (%d imgs, %.1f imgs/s incl. "
                   "featurize+IO)", rp + 1, num_rounds, done,
                   done / max(dt, 1e-9))
      pending = (r, handle) if handle is not None else None
  except BaseException:
    # best-effort: persist any shard whose device work was already
    # dispatched (double-buffering keeps one in flight) so an interruption
    # or featurize/IO error doesn't discard completed sampler minutes —
    # resume finds the npz and skips the shard.
    for rp, hp in list(inflight.items()):
      try:
        sampling_io.finish_samples(hp)
      except Exception:
        log.warning("could not persist in-flight sample shard %d", rp)
    raise
  feats = np.concatenate(all_feats)[:num_data]
  mu, cov = compute_stats(feats)

  # real-data statistics: precomputed assetdir npz, else streamed
  real_feats = None
  try:
    if assetdir is None:
      raise FileNotFoundError("no assetdir given")
    mu_ref, cov_ref, real_feats = load_dataset_stats(config, assetdir)
  except (FileNotFoundError, ValueError, KeyError):
    assert eval_ds is not None, (
        "no precomputed stats and no eval dataset to stream")
    cache = os.path.join(sample_dir,
                         f"real_stats_{extractor.name}.npz")
    mu_ref, cov_ref = compute_dataset_stats(config, eval_ds, extractor,
                                            num_data, cache_path=cache)

  # IS/KID first: if the covariance product is degenerate, frechet_distance
  # raises (by design) — don't let that discard the other metrics at the
  # end of a multi-hour sampling run.
  metrics = {}
  if all_probs:
    probs = np.concatenate(all_probs)[:num_data]
    metrics["inception_score"] = inception_score_from_probs(probs)
  # KID needs raw real features, not just moments; available whenever the
  # assetdir npz carries pool_3 activations, as the reference ecosystem's
  # stat files do (reference evaluation.py:303,319-320).
  if real_feats is not None:
    metrics["kid"] = kernel_distance(real_feats, feats)
  try:
    metrics["fid"] = frechet_distance(mu_ref, cov_ref, mu, cov)
  except ValueError as e:
    log.error("FID failed (%s); reporting nan FID alongside the other "
              "metrics", e)
    metrics["fid"] = float("nan")
    metrics["fid_error"] = str(e)

  dir_name = sampling_io.get_dir_name(config, sample_dir, step)
  report = os.path.join(dir_name, "report_metrics.npz")
  np.savez_compressed(report, **metrics)
  log.info("ckpt-%d metrics: %s", step, metrics)
  return metrics


def compute_bpd(config, eval_ds, scaler, inverse_scaler, nelbo_fn, nll_fn,
                model, params, step: int = 0, eval: bool = False,
                key=None, report_dir: Optional[str] = None) -> dict:
  """NELBO + exact-NLL evaluation loops (reference evaluation.py:377-464).

  Runs config.eval.nelbo_iter batches of the single-sample NELBO and
  config.eval.nll_iter batches of the probability-flow exact NLL
  ('correct' mode with the residual term), logging running mean/std.
  """
  if key is None:
    key = jax.random.PRNGKey(config.seed + 1)
  truncation_time = config.training.truncation_time
  results = {}

  # jit once, reuse across batches (the ODE while_loop would otherwise
  # re-trace per call); model is static via closure
  nelbo_jit = jax.jit(lambda p, b, k: nelbo_fn(model, p, b, k,
                                               eps=truncation_time))
  mode_ = "correct" if config.eval.residual else "wrong"
  nll_jit = jax.jit(lambda p, b, k: nll_fn(model, p, b, k,
                                           eps=truncation_time, mode=mode_))

  def batches():
    it = iter(eval_ds.as_numpy_iterator())
    while True:
      try:
        batch, it2 = get_batch(config, it, eval_ds)
        it = it2
      except StopIteration:
        return
      yield batch

  if config.eval.nelbo_iter > 0:
    vals = []
    gen = batches()
    for i in range(config.eval.nelbo_iter):
      try:
        batch = next(gen)
      except StopIteration:
        break
      key, k_dq, k_e = jax.random.split(key, 3)
      if config.data.dequantization == "uniform":
        batch = (255.0 * batch + jax.random.uniform(k_dq, batch.shape)) / 256.
      batch = scaler(batch)
      nelbo, residual = nelbo_jit(params, batch, k_e)
      total = np.asarray(nelbo) + (np.asarray(residual)
                                   if config.eval.residual else 0.0)
      vals.append(total)
      log.info("step %d nelbo batch %d: mean %.5f std %.5f", step, i,
               np.mean(np.concatenate(vals)),
               np.std(np.concatenate(vals)))
    if vals:
      vals = np.concatenate(vals)
      results["nelbo_bpd_mean"] = float(np.mean(vals))
      results["nelbo_bpd_std"] = float(np.std(vals))

  if config.eval.nll_iter > 0:
    vals = []
    gen = batches()
    for i in range(config.eval.nll_iter):
      try:
        batch = next(gen)
      except StopIteration:
        break
      key, k_dq, k_n = jax.random.split(key, 3)
      if config.data.dequantization == "uniform":
        batch = (255.0 * batch + jax.random.uniform(k_dq, batch.shape)) / 256.
      batch = scaler(batch)
      bpd, z, nfe = nll_jit(params, batch, k_n)
      vals.append(np.asarray(bpd))
      log.info("step %d nll batch %d: mean %.5f std %.5f (nfe %s)", step, i,
               np.mean(np.concatenate(vals)),
               np.std(np.concatenate(vals)), nfe)
    if vals:
      vals = np.concatenate(vals)
      results["nll_bpd_mean"] = float(np.mean(vals))
      results["nll_bpd_std"] = float(np.std(vals))

  log.info("step %d bpd results: %s", step, results)
  if report_dir and results:
    os.makedirs(report_dir, exist_ok=True)
    np.savez_compressed(os.path.join(report_dir, f"bpd_{step}.npz"),
                        **results)  # (reference save.py:59-67 equivalent)
  return results
