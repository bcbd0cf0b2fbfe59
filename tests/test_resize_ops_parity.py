"""Pixel-exact parity of the dataset crop/resize ops against the
reference's TF functions (reference datasets.py:74-105), run directly
from /root/reference on the same inputs. These ops determine what pixels
the models train on (LSUN crop_resize, CelebA-HQ resize_small +
central_crop, CelebA 140-crop), so they must match exactly.
"""

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
