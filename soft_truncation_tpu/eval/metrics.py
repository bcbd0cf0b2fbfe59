"""Metric math: FID (Frechet), KID (polynomial-kernel MMD), Inception score.

Parity targets: cleanfid/fid.py:27-106 (frechet_distance, kernel_distance)
and the tfgan metrics used in reference evaluation.py:308-320. Pure
numpy/scipy on stats-sized arrays (2048-d moments) — the heavy part,
feature extraction, runs on device in eval/inception.py.

A jax Newton-Schulz sqrtm is included for fully on-device FID when the
~1e-3 tolerance it carries is acceptable; scipy sqrtm is the default for
report numbers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg


def compute_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
  """(mu, sigma) of an [N, D] feature matrix (cleanfid/fid.py:560s path)."""
  features = np.asarray(features, dtype=np.float64)
  mu = features.mean(axis=0)
  sigma = np.cov(features, rowvar=False)
  return mu, sigma


def _sqrtm(a: np.ndarray) -> np.ndarray:
  """Matrix square root, portable across the scipy 1.18 `disp` removal
  (the old disp=False tuple form is deprecated; the future form returns
  the matrix alone and never prints — callers check finiteness)."""
  import warnings
  with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    try:
      out = scipy.linalg.sqrtm(a, disp=False)
      return out[0] if isinstance(out, tuple) else out
    except TypeError:  # scipy >= 1.18: disp argument removed
      return scipy.linalg.sqrtm(a)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
  """FID between two Gaussians (cleanfid/fid.py:27-81)."""
  mu1 = np.atleast_1d(np.asarray(mu1, dtype=np.float64))
  mu2 = np.atleast_1d(np.asarray(mu2, dtype=np.float64))
  sigma1 = np.atleast_2d(np.asarray(sigma1, dtype=np.float64))
  sigma2 = np.atleast_2d(np.asarray(sigma2, dtype=np.float64))
  assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

  diff = mu1 - mu2
  covmean = _sqrtm(sigma1.dot(sigma2))
  if not np.isfinite(covmean).all():
    offset = np.eye(sigma1.shape[0]) * eps
    covmean = _sqrtm((sigma1 + offset).dot(sigma2 + offset))
  if np.iscomplexobj(covmean):
    if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
      # Rank-deficient product (e.g. far fewer samples than feature
      # dims): regularize and retry instead of aborting a long eval run.
      # The reference (cleanfid/fid.py:66-71) raises here; in the
      # non-degenerate regime this branch is never taken, so results
      # are identical.
      offset = np.eye(sigma1.shape[0]) * eps
      covmean = _sqrtm((sigma1 + offset).dot(sigma2 + offset))
      if (np.iscomplexobj(covmean)
          and not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3)):
        raise ValueError(
            f"Imaginary component {np.max(np.abs(covmean.imag))}")
    covmean = covmean.real
  if not np.isfinite(covmean).all():
    # Both sqrtm attempts produced non-finite entries: surface it instead
    # of silently returning a nan/inf FID at the end of a long eval run.
    raise ValueError("sqrtm(sigma1 @ sigma2) is non-finite even after "
                     "eps-regularization; covariance inputs are degenerate")
  return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
               - 2 * np.trace(covmean))


def frechet_distance_jax(mu1, sigma1, mu2, sigma2,
                         num_iters: int = 50) -> jax.Array:
  """On-device FID via Newton-Schulz matrix sqrt of sigma1 sigma2."""
  mu1 = jnp.asarray(mu1, jnp.float32)
  mu2 = jnp.asarray(mu2, jnp.float32)
  s1 = jnp.asarray(sigma1, jnp.float32)
  s2 = jnp.asarray(sigma2, jnp.float32)
  a = s1 @ s2
  norm = jnp.linalg.norm(a)
  y = a / norm
  z = jnp.eye(a.shape[0], dtype=a.dtype)

  def body(i, yz):
    y, z = yz
    t = 0.5 * (3.0 * jnp.eye(a.shape[0], dtype=a.dtype) - z @ y)
    return (y @ t, t @ z)

  y, z = jax.lax.fori_loop(0, num_iters, body, (y, z))
  sqrt_a = y * jnp.sqrt(norm)
  diff = mu1 - mu2
  return (diff @ diff + jnp.trace(s1) + jnp.trace(s2)
          - 2.0 * jnp.trace(sqrt_a))


def kernel_distance(feats1: np.ndarray, feats2: np.ndarray,
                    num_subsets: int = 100,
                    max_subset_size: int = 1000) -> float:
  """KID: polynomial-kernel MMD averaged over subsets
  (cleanfid/fid.py:83-106)."""
  feats1 = np.asarray(feats1, dtype=np.float64)
  feats2 = np.asarray(feats2, dtype=np.float64)
  n = feats1.shape[1]
  m = min(min(feats1.shape[0], feats2.shape[0]), max_subset_size)
  t = 0.0
  rng = np.random.RandomState(0)
  for _ in range(num_subsets):
    x = feats2[rng.choice(feats2.shape[0], m, replace=False)]
    y = feats1[rng.choice(feats1.shape[0], m, replace=False)]
    a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
    b = (x @ y.T / n + 1) ** 3
    t += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
  return float(t / num_subsets / m)


def inception_score_from_probs(probs: np.ndarray,
                               num_splits: int = 10) -> float:
  """IS = exp(E KL(p(y|x) || p(y))), averaged over splits (tfgan
  classifier_score semantics, reference evaluation.py:308)."""
  probs = np.asarray(probs, dtype=np.float64)
  scores = []
  n = probs.shape[0]
  for i in range(num_splits):
    part = probs[i * n // num_splits:(i + 1) * n // num_splits]
    if len(part) == 0:
      continue
    py = part.mean(axis=0, keepdims=True)
    kl = part * (np.log(part + 1e-16) - np.log(py + 1e-16))
    scores.append(np.exp(kl.sum(axis=1).mean()))
  return float(np.mean(scores))
