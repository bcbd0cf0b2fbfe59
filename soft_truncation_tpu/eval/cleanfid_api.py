"""cleanfid-compatible public API over our extractor/metrics stack.

Capability parity with the reference's vendored cleanfid (cleanfid/fid.py:
get_folder_features:178, fid_folder:218, get_statistics_from_dataset:276,
compute_fid:555, compute_kid:497) — same artifact conventions
(samples_*.npz shards, cached feature npz) without the torchscript
dependency: features come from any eval.inception.FeatureExtractor.
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Optional, Tuple

import numpy as np

from .inception import FeatureExtractor, get_feature_extractor
from .metrics import compute_stats, frechet_distance, kernel_distance

log = logging.getLogger(__name__)


def get_folder_features(fdir: str, extractor: FeatureExtractor,
                        num_data: Optional[int] = None,
                        cache: bool = True) -> np.ndarray:
  """Featurize every samples_*.npz shard in a directory (cached)."""
  cache_path = os.path.join(fdir, f"features_{extractor.name}.npz")
  if cache and os.path.exists(cache_path):
    with np.load(cache_path) as f:
      feats = f["features"]
    return feats[:num_data] if num_data else feats

  feats = []
  shards = sorted(glob.glob(os.path.join(fdir, "samples_*.npz")))
  if not shards:
    raise FileNotFoundError(f"no samples_*.npz under {fdir}")
  for path in shards:
    with np.load(path) as f:
      samples = f["samples"]
    assert samples.dtype == np.uint8, path
    f_, _ = extractor(samples)
    feats.append(f_)
  feats = np.concatenate(feats)
  if cache:
    np.savez_compressed(cache_path, features=feats)
  return feats[:num_data] if num_data else feats


def get_statistics_from_dataset(ds, extractor: FeatureExtractor,
                                num_data: int,
                                cache_path: Optional[str] = None
                                ) -> Tuple[np.ndarray, np.ndarray]:
  """Stream a tf.data dataset of {'image': [B,H,W,C] in [0,1]} -> (mu, cov)."""
  if cache_path and os.path.exists(cache_path):
    with np.load(cache_path) as f:
      return f["mu"], f["cov"]
  feats, seen = [], 0
  for batch in ds.as_numpy_iterator():
    imgs = np.clip(batch["image"] * 255.0, 0, 255).astype(np.uint8)
    f_, _ = extractor(imgs)
    feats.append(f_)
    seen += len(imgs)
    if seen >= num_data:
      break
  mu, cov = compute_stats(np.concatenate(feats)[:num_data])
  if cache_path:
    np.savez_compressed(cache_path, mu=mu, cov=cov)
  return mu, cov


def compute_fid(fdir1: Optional[str] = None, fdir2: Optional[str] = None,
                stats_npz: Optional[str] = None, dataset=None,
                extractor: Optional[FeatureExtractor] = None,
                num_data: Optional[int] = None,
                assetdir: Optional[str] = None) -> float:
  """FID between a sample folder and (another folder | stats npz |
  streamed dataset) — the cleanfid compute_fid surface."""
  extractor = extractor or get_feature_extractor(None, assetdir)
  feats1 = get_folder_features(fdir1, extractor, num_data)
  mu1, cov1 = compute_stats(feats1)
  if fdir2 is not None:
    mu2, cov2 = compute_stats(get_folder_features(fdir2, extractor,
                                                  num_data))
  elif stats_npz is not None:
    with np.load(stats_npz) as f:
      mu2, cov2 = f["mu"], f["cov"]
  elif dataset is not None:
    assert num_data is not None
    mu2, cov2 = get_statistics_from_dataset(dataset, extractor, num_data)
  else:
    raise ValueError("need fdir2, stats_npz, or dataset")
  return frechet_distance(mu1, cov1, mu2, cov2)


def compute_kid(fdir1: str, fdir2: Optional[str] = None, dataset=None,
                extractor: Optional[FeatureExtractor] = None,
                num_data: Optional[int] = None) -> float:
  """KID between a sample folder and a second folder / dataset."""
  extractor = extractor or get_feature_extractor(None, None)
  feats1 = get_folder_features(fdir1, extractor, num_data)
  if fdir2 is not None:
    feats2 = get_folder_features(fdir2, extractor, num_data)
  else:
    feats2, seen = [], 0
    for batch in dataset.as_numpy_iterator():
      imgs = np.clip(batch["image"] * 255.0, 0, 255).astype(np.uint8)
      f_, _ = extractor(imgs)
      feats2.append(f_)
      seen += len(imgs)
      if num_data and seen >= num_data:
        break
    feats2 = np.concatenate(feats2)[:num_data]
  return kernel_distance(feats1, feats2)
