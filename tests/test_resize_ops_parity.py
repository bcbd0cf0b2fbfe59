"""Pixel-exact parity of the dataset crop/resize ops against the
reference's TF functions (reference datasets.py:74-105), run directly
from /root/reference on the same inputs. These ops determine what pixels
the models train on (LSUN crop_resize, CelebA-HQ resize_small +
central_crop, CelebA 140-crop), so they must match exactly.
"""

import os
import sys
import types

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from soft_truncation_tpu.data import datasets as our_ds

# The reference module imports dataset/loader deps that are irrelevant to
# the pure TF image ops under test (and absent here: zero-egress image).
for _mod in ("tensorflow_datasets", "natsort", "torchvision",
             "torchvision.transforms"):
  sys.modules.setdefault(_mod, types.ModuleType(_mod))
if not os.path.isdir("/root/reference"):
  pytest.skip("reference checkout not mounted",
              allow_module_level=True)
sys.path.insert(0, "/root/reference")
import datasets as ref_ds  # noqa: E402  (reference module, CPU TF ops only)


def _img(h, w, seed=0):
  rng = np.random.RandomState(seed)
  return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("hw", [(128, 96), (96, 128), (100, 100)])
def test_crop_resize_parity(hw):
  img = tf.constant(_img(*hw))
  ours = our_ds.crop_resize(img, 64).numpy()
  want = ref_ds.crop_resize(img, 64).numpy()
  np.testing.assert_array_equal(ours, want)


@pytest.mark.parametrize("hw", [(128, 96), (96, 128)])
def test_resize_small_parity(hw):
  img = tf.constant(_img(*hw).astype(np.float32))
  ours = our_ds.resize_small(img, 64).numpy()
  want = ref_ds.resize_small(img, 64).numpy()
  assert ours.shape == want.shape
  np.testing.assert_allclose(ours, want, rtol=1e-6, atol=1e-4)


def test_central_crop_parity():
  img = tf.constant(_img(178, 218))
  ours = our_ds.central_crop(img, 140).numpy()
  want = ref_ds.central_crop(img, 140).numpy()
  np.testing.assert_array_equal(ours, want)


def test_clean_resize_parity_vs_reference_cleanfid():
  """FID is sensitive to the 'clean' PIL-bicubic per-channel float32
  resize (SURVEY.md hard part); ours must match the reference's
  cleanfid build_resizer('clean') bit-for-bit."""
  for _mod in ("requests",):
    sys.modules.setdefault(_mod, types.ModuleType(_mod))
  from cleanfid.resize import build_resizer  # reference (path added above)

  from soft_truncation_tpu.eval.inception import clean_resize

  ref_fn = build_resizer("clean")
  imgs = np.stack([_img(64, 64, seed=s) for s in range(3)])
  ours = clean_resize(imgs, size=299)
  want = np.stack([ref_fn(imgs[i]) for i in range(len(imgs))])
  np.testing.assert_array_equal(ours, want.astype(np.float32))


def test_fid_kid_parity_vs_reference_cleanfid():
  """Our FID/KID math vs the reference's own cleanfid functions
  (cleanfid/fid.py:27-107) on the same feature matrices."""
  # cleanfid/fid.py's import chain needs torchvision model classes, but
  # frechet_distance/kernel_distance are pure numpy/scipy: execute just
  # those two reference function definitions.
  import ast
  import logging
  import types as _types

  from scipy import linalg

  src = open("/root/reference/cleanfid/fid.py").read()
  tree = ast.parse(src)
  wanted = [n for n in tree.body
            if isinstance(n, ast.FunctionDef)
            and n.name in ("frechet_distance", "kernel_distance")]
  assert len(wanted) == 2
  ns = {"np": np, "linalg": linalg, "logging": logging}
  exec(compile(ast.Module(body=wanted, type_ignores=[]),
               "/root/reference/cleanfid/fid.py", "exec"), ns)
  ref_fid = _types.SimpleNamespace(**ns)

  from soft_truncation_tpu.eval.metrics import (compute_stats,
                                                frechet_distance,
                                                kernel_distance)

  rng = np.random.RandomState(3)
  f1 = rng.normal(size=(700, 32)).astype(np.float64)
  f2 = rng.normal(loc=0.25, scale=1.1, size=(650, 32)).astype(np.float64)

  mu1, c1 = compute_stats(f1)
  mu2, c2 = compute_stats(f2)
  ours_fid = frechet_distance(mu1, c1, mu2, c2)
  want_fid = ref_fid.frechet_distance(mu1, c1, mu2, c2)
  np.testing.assert_allclose(ours_fid, want_fid, rtol=1e-10)

  # KID is a Monte-Carlo subset estimator; the reference draws from the
  # GLOBAL np.random while ours uses a seeded RandomState(0). Pin the
  # reference to the same stream so the subset indices coincide exactly.
  ours_kid = kernel_distance(f1, f2)
  rs = np.random.RandomState(0)
  orig_choice = np.random.choice
  np.random.choice = rs.choice
  try:
    want_kid = ref_fid.kernel_distance(f1, f2)
  finally:
    np.random.choice = orig_choice
  np.testing.assert_allclose(ours_kid, want_kid, rtol=1e-10)
