"""Sample generation I/O: resumable npz sample shards, PNG grids, cached
feature statistics.

Parity target: reference sampling_lib.py (get_dir_name/get_samples/
get_latents/save_statistics) and save.py. Artifacts are idempotent: a
shard or statistics file that already exists is loaded, not regenerated
(the reference's resumability story, SURVEY.md section 4).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


@jax.jit
def _to_uint8(x):
  # on-device quantization: truncation toward zero matches host
  # np.clip(x*255).astype(uint8), and the fetch moves 4x fewer bytes
  return jnp.clip(x * 255.0, 0, 255).astype(jnp.uint8)


def get_dir_name(config, sample_dir: str, step: int) -> str:
  """Encode sampler hyperparameters into the directory name
  (reference sampling_lib.py:29-34)."""
  s = config.sampling
  if s.method == "pc":
    tag = (f"{s.method}_{s.predictor}_{s.corrector}_snr{s.snr}"
           f"_n{s.n_steps_each}_trunc{s.truncation_time}")
  else:
    tag = f"{s.method}_trunc{s.truncation_time}"
  return os.path.join(sample_dir, f"ckpt_{step}_{tag}")


def save_image_grid(samples_uint8: np.ndarray, path,
                    max_images: int = 64, format: str = None) -> None:
  """Save a PNG grid (replaces torchvision.utils.save_image,
  reference sampling_lib.py:49-54). ``path`` may be a filesystem path or
  a writable file object (then pass ``format``, e.g. "PNG" — used by the
  serving endpoint to stream grids without touching disk)."""
  from PIL import Image

  imgs = samples_uint8[:max_images]
  n = len(imgs)
  cols = int(np.ceil(np.sqrt(n)))
  rows = int(np.ceil(n / cols))
  h, w, c = imgs.shape[1:]
  grid = np.zeros((rows * h, cols * w, c), dtype=np.uint8)
  for i, img in enumerate(imgs):
    r, col = divmod(i, cols)
    grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = img
  if c == 1:
    grid = grid[..., 0]
  Image.fromarray(grid).save(path, format=format)


def begin_samples(config, model, params, sampling_fn, step: int,
                  sampling_idx: int, sample_dir: str,
                  key: Optional[jax.Array] = None):
  """Dispatch one shard of sampling WITHOUT waiting for the device.

  Returns an opaque handle for :func:`finish_samples`. If the shard npz
  already exists nothing is dispatched (resumability,
  reference sampling_lib.py:36-57). The float->uint8 conversion runs on
  device so the (tunneled) device->host fetch moves 4x fewer bytes;
  XLA's float->int convert truncates toward zero exactly like the
  host ``np.clip(x*255).astype(uint8)`` it replaces."""
  dir_name = get_dir_name(config, sample_dir, step)
  os.makedirs(dir_name, exist_ok=True)
  shard_path = os.path.join(dir_name, f"samples_{sampling_idx}.npz")
  if os.path.exists(shard_path):
    return ("cached", shard_path, None)

  if key is None:
    key = jax.random.PRNGKey(sampling_idx)
  samples, nfe = sampling_fn(model, params, key)
  samples_u8 = _to_uint8(samples)
  return ("pending", shard_path, (samples_u8, nfe, dir_name, sampling_idx))


def finish_samples(handle) -> np.ndarray:
  """Block on a :func:`begin_samples` handle; for freshly generated
  shards, fetch from device and write the shard npz + PNG grid; return
  uint8 NHWC samples."""
  kind, shard_path, payload = handle
  if kind == "cached":
    with np.load(shard_path) as f:
      return f["samples"]
  samples_u8, nfe, dir_name, sampling_idx = payload
  samples = np.asarray(samples_u8)  # the device fetch happens HERE
  np.savez_compressed(shard_path, samples=samples)
  save_image_grid(samples, os.path.join(dir_name,
                                        f"samples_{sampling_idx}.png"))
  log.info("wrote %s (%d samples, nfe=%s)", shard_path, len(samples), nfe)
  return samples


def get_samples(config, model, params, sampling_fn, step: int,
                sampling_idx: int, sample_dir: str,
                key: Optional[jax.Array] = None) -> np.ndarray:
  """Generate (or load cached) one shard of samples as uint8 NHWC
  (reference sampling_lib.py:36-57)."""
  return finish_samples(begin_samples(config, model, params, sampling_fn,
                                      step, sampling_idx, sample_dir,
                                      key=key))


def get_latents(config, samples_uint8: np.ndarray, extractor, step: int,
                sampling_idx: int, sample_dir: str) -> Tuple[np.ndarray,
                                                             np.ndarray]:
  """Inception features for one shard, cached next to the samples
  (reference sampling_lib.py:59-83).

  Caches are keyed by the extractor's content fingerprint: a cached npz
  written under DIFFERENT weights (e.g. a regenerated random-init
  Inception) is recomputed, not returned — stale sample features mixed
  with fresh real-side statistics produce silently-wrong FID. Legacy
  caches without a fingerprint are trusted (resumability of pre-existing
  runs)."""
  dir_name = get_dir_name(config, sample_dir, step)
  stat_path = os.path.join(dir_name, f"statistics_{sampling_idx}.npz")
  fp = getattr(extractor, "fingerprint", None)
  if os.path.exists(stat_path):
    with np.load(stat_path) as f:
      cached_fp = str(f["fingerprint"]) if "fingerprint" in f.files else None
      if cached_fp is None or fp is None or cached_fp == fp:
        return f["pool_3"], (f["logits"] if "logits" in f.files else None)
    log.info("feature cache %s was computed under extractor %s != %s — "
             "recomputing", stat_path, cached_fp, fp)
  feats, probs = extractor(samples_uint8)
  np.savez_compressed(stat_path, pool_3=feats,
                      **({"logits": probs} if probs is not None else {}),
                      **({"fingerprint": fp} if fp else {}))
  return feats, probs


def load_all_statistics(config, sample_dir: str, step: int):
  """Concatenate every cached statistics shard for a checkpoint."""
  import glob

  dir_name = get_dir_name(config, sample_dir, step)
  feats, probs = [], []
  for path in sorted(glob.glob(os.path.join(dir_name, "statistics_*.npz"))):
    with np.load(path) as f:
      feats.append(f["pool_3"])
      if "logits" in f.files:
        probs.append(f["logits"])
  if not feats:
    return None, None
  return (np.concatenate(feats),
          np.concatenate(probs) if probs else None)
