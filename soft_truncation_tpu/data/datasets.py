"""Input pipeline: tf.data on the host, NHWC batches out (float32 [0,1],
or uint8 for the train path when transport_uint8() — see that function).

Capability parity with reference datasets.py (CIFAR10/SVHN/CELEBA/LSUN via
TFDS; FFHQ/CelebAHQ via score_sde-format TFRecords; IMAGENET32/STL10 via
local arrays) with portable source resolution instead of the reference's
hardcoded lab-host IP checks (datasets.py:147-161,230-239,258-269):

  1. TFDS, if installed and the dataset is already prepared locally
  2. local .npz arrays under $SOFT_TRUNCATION_DATA_DIR (or
     config.data.data_dir): <name>_train.npz / <name>_test.npz with an
     'images' uint8 NHWC array
  3. score_sde-format TFRecords (config.data.tfrecords_path)
  4. a deterministic synthetic dataset (loud warning) so smoke tests and
     benchmarks run in data-less environments

Per-host sharding for multi-host pods happens here (ds.shard), so the
jitted train step always sees this host's slice of the global batch.
"""

from __future__ import annotations

import logging
import os
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)

try:
  import tensorflow as tf
  tf.config.set_visible_devices([], "GPU")
  try:
    tf.config.set_visible_devices([], "TPU")
  except Exception:
    pass
  _HAVE_TF = True
except Exception:  # pragma: no cover
  tf = None
  _HAVE_TF = False

try:
  import tensorflow_datasets as tfds
  _HAVE_TFDS = True
except Exception:
  tfds = None
  _HAVE_TFDS = False


# ---------------------------------------------------------------------------
# scalers (reference datasets.py:56-71)
# ---------------------------------------------------------------------------


def get_data_scaler(config):
  """Data normalizer; data is always in [0, 1] coming out of the pipeline."""
  if config.data.centered:
    return lambda x: x * 2.0 - 1.0
  return lambda x: x


def get_data_inverse_scaler(config):
  if config.data.centered:
    return lambda x: (x + 1.0) / 2.0
  return lambda x: x


def make_preprocess_fn(config):
  """Jit-traceable (batch, key) -> scaled batch, fused into the train program.

  Handles uint8 transport (see transport_uint8), uniform dequantization, and
  scaling in ONE place so every consumer of the production train step
  (run_lib.train, tools/bench_e2e_loop.py) runs the identical program.
  Running these eagerly costs several small dispatches per step — measured
  ~20% of end-to-end wall on a v5e (benchmarks/ROOFLINE.md).
  """
  scaler = get_data_scaler(config)
  dequant = config.data.dequantization == "uniform"

  def _preprocess(batch, k):
    if batch.dtype == jnp.uint8 and dequant:
      # exact form of the reference chain (255*(k/255)+u)/256 = (k+u)/256
      # (one f32 rounding instead of three; agrees with the float-
      # transport chain to <=1 ulp — test_uint8_transport_*)
      batch = ((batch.astype(jnp.float32) + jax.random.uniform(k, batch.shape))
               * np.float32(1.0 / 256.0))
    else:
      if batch.dtype == jnp.uint8:
        # x * f32(1/255): same op tf.image.convert_image_dtype performs
        # (bit-identical eagerly; XLA fusion can differ by 1 ulp)
        batch = batch.astype(jnp.float32) * np.float32(1.0 / 255.0)
      if dequant:
        batch = (255.0 * batch
                 + jax.random.uniform(k, batch.shape)) / 256.0
    return scaler(batch)

  return _preprocess


# ---------------------------------------------------------------------------
# resize ops (reference datasets.py:74-103)
# ---------------------------------------------------------------------------


def crop_resize(image, resolution):
  """Center-crop to square then bicubic resize."""
  shape = tf.shape(image)
  h, w = shape[0], shape[1]
  crop = tf.minimum(h, w)
  image = image[(h - crop) // 2:(h + crop) // 2,
                (w - crop) // 2:(w + crop) // 2]
  image = tf.image.resize(image, size=(resolution, resolution),
                          antialias=True,
                          method=tf.image.ResizeMethod.BICUBIC)
  return tf.cast(image, tf.uint8)


def resize_small(image, resolution):
  """Shrink so the short side equals resolution."""
  h, w = image.shape[0], image.shape[1]
  ratio = resolution / min(h, w)
  return tf.image.resize(image, [int(h * ratio), int(w * ratio)],
                         antialias=True)


def central_crop(image, size):
  top = (image.shape[0] - size) // 2
  left = (image.shape[1] - size) // 2
  return tf.image.crop_to_bounding_box(image, top, left, size, size)


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------

_TFDS_NAMES = {
    "CIFAR10": "cifar10",
    "CIFAR100": "cifar100",
    "SVHN": "svhn_cropped",
    "CELEBA": "celeb_a",
    "STL10": "stl10",
}

_SPLITS = {
    "CIFAR10": ("train", "test"),
    "CIFAR100": ("train", "test"),
    "SVHN": ("train", "test"),
    "CELEBA": ("train", "test"),
    "STL10": ("train", "test"),
    "LSUN": ("train", "validation"),
    "IMAGENET32": ("train", "validation"),
}


def _data_dir(config) -> Optional[str]:
  return (config.data.get("data_dir", None)
          or os.environ.get("SOFT_TRUNCATION_DATA_DIR"))


def _npz_path(config, split: str) -> Optional[str]:
  root = _data_dir(config)
  if not root:
    return None
  name = config.data.dataset.lower()
  path = os.path.join(root, f"{name}_{split}.npz")
  return path if os.path.exists(path) else None


def _load_tfds(config, split: str):
  if not _HAVE_TFDS:
    return None
  name = _TFDS_NAMES.get(config.data.dataset)
  if config.data.dataset == "LSUN":
    name = f"lsun/{config.data.category}"
  if name is None:
    return None
  try:
    builder = tfds.builder(name, data_dir=_data_dir(config))
    builder.download_and_prepare()
    return builder.as_dataset(split=split, shuffle_files=True)
  except Exception as e:  # dataset not prepared and no network
    log.warning("TFDS source unavailable for %s: %s", name, e)
    return None


def _load_npz_array(config, split: str) -> Optional[np.ndarray]:
  path = _npz_path(config, split)
  if path is None:
    return None
  with np.load(path) as f:
    images = f["images"]
  assert images.dtype == np.uint8 and images.ndim == 4
  log.info("loaded %s: %s images from %s", config.data.dataset,
           len(images), path)
  return images


def _load_npz(config, split: str):
  images = _load_npz_array(config, split)
  if images is None:
    return None
  return tf.data.Dataset.from_tensor_slices({"image": images})


def _load_tfrecords(config):
  path = config.data.get("tfrecords_path", None)
  if not path or not os.path.exists(path):
    return None
  ds = tf.data.TFRecordDataset(path)

  def parse(d):
    sample = tf.io.parse_single_example(d, features={
        "shape": tf.io.FixedLenFeature([3], tf.int64),
        "data": tf.io.FixedLenFeature([], tf.string)})
    data = tf.io.decode_raw(sample["data"], tf.uint8)
    data = tf.reshape(data, sample["shape"])
    return {"image": tf.transpose(data, (1, 2, 0))}  # CHW -> HWC

  return ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE)


def _bilinear_upsample_np(a: np.ndarray, out_len: int, axis: int
                          ) -> np.ndarray:
  """Half-pixel bilinear interpolation along one axis (numpy, host)."""
  in_len = a.shape[axis]
  x = (np.arange(out_len) + 0.5) * (in_len / out_len) - 0.5
  xf = np.floor(x).astype(np.int64)
  x0 = np.clip(xf, 0, in_len - 1)
  x1 = np.clip(xf + 1, 0, in_len - 1)
  frac = np.clip(x - xf, 0.0, 1.0).astype(a.dtype)
  shape = [1] * a.ndim
  shape[axis] = out_len
  f = frac.reshape(shape)
  return np.take(a, x0, axis=axis) * (1 - f) + np.take(a, x1, axis=axis) * f


def _synthetic_array(config, split: str) -> np.ndarray:
  """Deterministic stand-in data (uint8) for data-less environments."""
  n = 2048 if split != "train" else 8192
  size = config.data.image_size
  c = config.data.num_channels
  log.warning("SYNTHETIC DATA in use for %s/%s — no real dataset found. "
              "Set SOFT_TRUNCATION_DATA_DIR or install/prepare TFDS.",
              config.data.dataset, split)
  rng = np.random.RandomState(0 if split == "train" else 1)
  # low-freq random images: random 4x4 upsampled, mildly noised.
  # Data-pipeline work stays on HOST: running the resize on the default
  # (TPU) device dragged ~100 MB through the tunneled runtime — measured
  # ~4 min of eval-CLI startup for a stand-in dataset.
  base = rng.randint(0, 256, size=(n, 4, 4, c)).astype(np.float32)
  try:
    cpu = jax.local_devices(backend="cpu")[0]
  except RuntimeError:
    cpu = None  # axon-only process: the plugin may register no CPU client
  if cpu is not None:
    with jax.default_device(cpu):
      imgs = np.asarray(jax.image.resize(jnp.asarray(base),
                                         (n, size, size, c), "linear"))
  else:
    # Pure-numpy half-pixel bilinear upsample: matches jax.image.resize
    # 'linear' for this pure upsample (edge-clamped taps == jax's
    # renormalized boundary kernel when the support is <= 2 taps), and —
    # unlike a TF fallback — works in a TF-less axon-only process too.
    imgs = _bilinear_upsample_np(_bilinear_upsample_np(base, size, axis=1),
                                 size, axis=2)
  imgs = imgs + rng.normal(0, 8, size=(n, size, size, c))
  return np.clip(imgs, 0, 255).astype(np.uint8)


def _synthetic(config, split: str):
  return tf.data.Dataset.from_tensor_slices(
      {"image": _synthetic_array(config, split)})


def _resize_op(config):
  dataset = config.data.dataset
  size = config.data.image_size

  if dataset == "CELEBA":
    def op(img):
      img = tf.image.convert_image_dtype(img, tf.float32)
      img = central_crop(img, 140)
      return resize_small(img, size)
  elif dataset == "LSUN" and size == 128:
    def op(img):
      img = tf.image.convert_image_dtype(img, tf.float32)
      img = resize_small(img, size)
      return central_crop(img, size)
  elif dataset == "LSUN":
    def op(img):
      img = crop_resize(img, size)
      return tf.image.convert_image_dtype(img, tf.float32)
  else:
    def op(img):
      img = tf.image.convert_image_dtype(img, tf.float32)
      return tf.image.resize(img, [size, size], antialias=True)
  return op


class _NativeTrainDataset:
  """Infinite shuffled batches from a resident uint8 array via the C++
  batch assembler (data/native/). Duck-types the tf.data surface used by
  run_lib (as_numpy_iterator yielding {'image': [B,H,W,C] float32 [0,1]});
  dequantization/scaling stay in the jitted step exactly as on the tf
  path, so swapping pipelines never changes training math."""

  def __init__(self, images: np.ndarray, batch_size: int, random_flip: bool,
               seed: int):
    from .native import NativeBatcher
    self._batcher = NativeBatcher(images, batch_size,
                                  random_flip=random_flip,
                                  uniform_dequant=False, centered=False,
                                  seed=seed)

  def as_numpy_iterator(self):
    for batch in self._batcher:
      yield {"image": batch}


class _NativeEvalDataset:
  """One finite pass over a resident uint8 array, no augmentation."""

  def __init__(self, images: np.ndarray, batch_size: int):
    self._images = images
    self._bs = batch_size

  def as_numpy_iterator(self):
    for i in range(0, len(self._images), self._bs):
      chunk = self._images[i:i + self._bs]
      yield {"image": chunk.astype(np.float32) / 255.0}


def _native_dataset(config, split: str, evaluation: bool):
  """config.data.pipeline='native': resident-array source (npz at final
  size, or synthetic), per-host sharded, batched by the native assembler."""
  images = _load_npz_array(config, split)
  if images is None:
    if config.data.dataset in _TFDS_NAMES or config.data.dataset in (
        "FFHQ", "CelebAHQ", "LSUN", "IMAGENET32"):
      log.warning("native pipeline: no npz for %s/%s "
                  "(tools/make_dataset_npz.py builds them); synthetic data",
                  config.data.dataset, split)
    images = _synthetic_array(config, split)
  expect = (config.data.image_size, config.data.image_size,
            config.data.num_channels)
  assert images.shape[1:] == expect, (
      f"native pipeline needs pre-sized npz images {expect}, got "
      f"{images.shape[1:]} — rebuild with tools/make_dataset_npz.py")
  if jax.process_count() > 1:
    images = images[jax.process_index()::jax.process_count()]
  batch_size = (config.eval.batch_size if evaluation
                else config.training.batch_size)
  per_host = batch_size // jax.process_count()
  if evaluation:
    return _NativeEvalDataset(images, per_host)
  return _NativeTrainDataset(images, per_host,
                             random_flip=config.data.random_flip,
                             seed=config.seed)


def transport_uint8(config, evaluation: bool = False) -> bool:
  """Should the train pipeline yield uint8 batches instead of float32?

  uint8 transport moves 4x fewer host->device bytes — on the tunneled
  v5e runtime the f32 batch upload serializes with compute and costs
  ~12.5 ms/step at batch 128 (benchmarks/ROOFLINE.md "End-to-end CLI").
  The device reconstructs the float chain (x * f32(1/255), the same op
  tf.image.convert_image_dtype performs; the dequantized form (k+u)/256
  is algebraically exact with ONE f32 rounding) — lossless to <=1 ulp
  when the pipeline's float values lie on the k/255 grid
  (tests/test_data_sources.py::test_uint8_transport_*).

  config.data.transport_dtype: 'auto' (default) enables uint8 only for
  provably grid-exact pipelines — the native pipeline (pre-sized uint8
  arrays) and uint8 sources at their native size with no fractional
  resize; 'uint8' forces it (quantize-back rounds to the nearest grid
  point, max error 1/510 — reasonable for resized datasets too);
  'float32' disables. Eval pipelines always yield float32 (bpd parity)."""
  if evaluation:
    return False
  mode = config.data.get("transport_dtype", "auto")
  if mode not in ("auto", "uint8", "float32"):
    raise ValueError(f"config.data.transport_dtype must be 'auto', "
                     f"'uint8' or 'float32', got {mode!r}")
  if mode != "auto":
    return mode == "uint8"
  if config.data.get("pipeline", "tf") == "native":
    return True  # asserts pre-sized uint8 sources
  if config.data.dataset == "Synthetic":
    return True  # generated uint8 at final size
  native_sizes = {"CIFAR10": 32, "CIFAR100": 32, "SVHN": 32,
                  "IMAGENET32": 32, "STL10": 96}
  return native_sizes.get(config.data.dataset) == config.data.image_size


def _quantize_back_np(batch_f32: np.ndarray) -> np.ndarray:
  """Inverse of x/255 on the k/255 grid (exact): round(x*255) as uint8."""
  return np.rint(batch_f32 * 255.0).astype(np.uint8)


class _Uint8Transport:
  """Wrap a float-yielding dataset to yield uint8 (native pipeline)."""

  def __init__(self, inner):
    self._inner = inner

  def as_numpy_iterator(self):
    for d in self._inner.as_numpy_iterator():
      yield {"image": _quantize_back_np(d["image"])}


def get_dataset(config, evaluation_only: bool = False,
                shard_per_host: bool = True):
  """Build (train_ds, eval_ds) pipelines of image batches.

  tf path: repeat -> shuffle(10k) -> map(resize+flip) -> batch -> prefetch
  (reference datasets.py:328-344). native path: resident uint8 array +
  C++ batch assembler (gather+flip fused, data/native/). Both yield numpy
  dicts {'image': [B,H,W,C] float32 in [0,1]}.
  """
  pipeline = config.data.get("pipeline", "tf")
  if pipeline not in ("tf", "native"):
    raise ValueError(f"config.data.pipeline must be 'tf' or 'native', "
                     f"got {pipeline!r}")
  if pipeline == "native":
    train_split, eval_split = _SPLITS.get(config.data.dataset,
                                          ("train", "train"))
    eval_ds = _native_dataset(config, eval_split, evaluation=True)
    if evaluation_only:
      return None, eval_ds
    train_ds = _native_dataset(config, train_split, evaluation=False)
    if transport_uint8(config):
      train_ds = _Uint8Transport(train_ds)
    return train_ds, eval_ds

  assert _HAVE_TF, "tf.data input pipeline requires tensorflow"

  def build(split: str, evaluation: bool):
    ds = None
    if config.data.dataset in ("FFHQ", "CelebAHQ"):
      ds = _load_tfrecords(config)
    if ds is None:
      ds = _load_npz(config, split)
    if ds is None:
      ds = _load_tfds(config, split)
    if ds is None:
      ds = _synthetic(config, split)

    if shard_per_host and jax.process_count() > 1:
      ds = ds.shard(jax.process_count(), jax.process_index())

    batch_size = (config.eval.batch_size if evaluation
                  else config.training.batch_size)
    per_host = batch_size // jax.process_count()
    resize = _resize_op(config)

    to_uint8 = transport_uint8(config, evaluation=evaluation)

    def preprocess(d):
      img = resize(d["image"])
      if config.data.random_flip and not evaluation:
        img = tf.image.random_flip_left_right(img)
      if to_uint8:
        # quantize-back for uint8 transport: exact inverse of /255 on
        # grid values; the device redoes x/255 bit-identically
        img = tf.cast(tf.round(img * 255.0), tf.uint8)
      return {"image": img}

    options = tf.data.Options()
    options.experimental_optimization.map_parallelization = True
    ds = ds.with_options(options)
    ds = ds.repeat(count=1 if evaluation else None)
    ds = ds.shuffle(10000, seed=config.seed if evaluation else None)
    ds = ds.map(preprocess, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(per_host, drop_remainder=not evaluation)
    return ds.prefetch(tf.data.AUTOTUNE)

  train_split, eval_split = _SPLITS.get(config.data.dataset,
                                        ("train", "train"))
  eval_ds = build(eval_split, evaluation=True)
  if evaluation_only:
    return None, eval_ds
  train_ds = build(train_split, evaluation=False)
  return train_ds, eval_ds


def get_batch(config, data_iter, ds) -> Tuple[np.ndarray, Iterator]:
  """Next batch as a HOST numpy NHWC array (float32 in [0,1], or uint8
  when :func:`transport_uint8` — the jitted preprocess converts on
  device); restarts exhausted epochs (reference datasets.py:106-113).

  Host numpy is deliberate: the consumer decides when/where the single
  host->device transfer happens (run_lib stacks a steps_per_dispatch
  window and device_puts once). Returning a device array here measured
  ~180 ms/step of device->host round-trip on the tunneled runtime when
  the caller staged batches host-side."""
  try:
    batch = next(data_iter)
  except StopIteration:
    log.info("New Epoch Start")
    data_iter = iter(ds.as_numpy_iterator())
    batch = next(data_iter)
  img = np.asarray(batch["image"])
  assert img.shape[1:] == (config.data.image_size, config.data.image_size,
                           config.data.num_channels), img.shape
  return img, data_iter
