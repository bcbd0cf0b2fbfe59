"""Data source resolution: local npz arrays, TFRecords, legacy configs."""

import importlib.util
import os
import tempfile

import jax
import numpy as np
import pytest

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.data import get_batch, get_dataset


def test_npz_source_roundtrip(monkeypatch):
  rng = np.random.RandomState(0)
  with tempfile.TemporaryDirectory() as d:
    train = rng.randint(0, 256, size=(64, 32, 32, 3), dtype=np.uint8)
    test = rng.randint(0, 256, size=(32, 32, 32, 3), dtype=np.uint8)
    np.savez(os.path.join(d, "cifar10_train.npz"), images=train)
    np.savez(os.path.join(d, "cifar10_test.npz"), images=test)
    monkeypatch.setenv("SOFT_TRUNCATION_DATA_DIR", d)

    config = default_config("cifar10")
    override(config, {"training": dict(batch_size=16),
                      "eval": dict(batch_size=16)})
    train_ds, eval_ds = get_dataset(config)
    it = iter(train_ds.as_numpy_iterator())
    batch, it = get_batch(config, it, train_ds)
    assert batch.shape == (16, 32, 32, 3)
    # CIFAR10@32 is grid-exact -> 'auto' transport yields uint8 train
    # batches (4x fewer host->device bytes; device redoes /255)
    assert batch.dtype == np.uint8
    # eval dataset stays float32 and is a single epoch of 32 items
    chunks = list(eval_ds.as_numpy_iterator())
    assert sum(len(b["image"]) for b in chunks) == 32
    assert chunks[0]["image"].dtype == np.float32
    assert float(chunks[0]["image"].max()) <= 1.0


def test_tfrecord_source(tmp_path):
  import tensorflow as tf

  rng = np.random.RandomState(1)
  path = str(tmp_path / "data.tfrecords")
  with tf.io.TFRecordWriter(path) as w:
    for _ in range(8):
      img = rng.randint(0, 256, size=(3, 16, 16), dtype=np.uint8)  # CHW
      ex = tf.train.Example(features=tf.train.Features(feature={
          "shape": tf.train.Feature(
              int64_list=tf.train.Int64List(value=img.shape)),
          "data": tf.train.Feature(
              bytes_list=tf.train.BytesList(value=[img.tobytes()])),
      }))
      w.write(ex.SerializeToString())

  config = default_config("lsun")
  override(config, {
      "training": dict(batch_size=4),
      "eval": dict(batch_size=4),
      "data": dict(dataset="CelebAHQ", image_size=16,
                   tfrecords_path=path, random_flip=False),
  })
  train_ds, _ = get_dataset(config)
  batch = next(iter(train_ds.as_numpy_iterator()))
  assert batch["image"].shape == (4, 16, 16, 3)


def test_legacy_rve_sde_config_buildable():
  """ve/cifar10_uncsn_deep_1e-5.py uses training.sde='rve-sde' +
  config.uncsn.eta — unrunnable in the reference's get_sde; works here."""
  from soft_truncation_tpu.sde import ReciprocalVESDE, get_sde
  path = os.path.join("soft_truncation_tpu", "configs", "ve",
                      "cifar10_uncsn_deep_1e-5.py")
  spec = importlib.util.spec_from_file_location("legacy_rve", path)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  config = mod.get_config()
  sde = get_sde(config)
  assert isinstance(sde, ReciprocalVESDE)
  assert sde.eta == config.uncsn.eta


def test_uint8_transport_bit_exact():
  """uint8 transport must reproduce the float chain bit for bit: the
  device-side x/255 (f32) equals tf.image.convert_image_dtype for every
  uint8 value, and quantize-back is the exact inverse on the grid."""
  import jax.numpy as jnp
  import tensorflow as tf
  from soft_truncation_tpu.data.datasets import _quantize_back_np

  k = np.arange(256, dtype=np.uint8)
  host = tf.image.convert_image_dtype(tf.constant(k), tf.float32).numpy()
  # multiply by the f32 reciprocal, as convert_image_dtype does — true
  # division differs by 1 ulp for ~half the values
  device = np.asarray(jnp.asarray(k).astype(jnp.float32)
                      * np.float32(1.0 / 255.0))
  np.testing.assert_array_equal(host, device)
  np.testing.assert_array_equal(_quantize_back_np(host), k)


def test_transport_dtype_resolution():
  from soft_truncation_tpu.data import transport_uint8

  config = default_config("cifar10")
  assert transport_uint8(config)                      # CIFAR10@32: exact
  assert not transport_uint8(config, evaluation=True)  # eval always f32
  config.data.image_size = 64
  assert not transport_uint8(config)                  # fractional resize
  config.data.transport_dtype = "uint8"
  assert transport_uint8(config)                      # explicit override
  config.data.transport_dtype = "float32"
  config.data.image_size = 32
  assert not transport_uint8(config)

  celeba = default_config("celeba")
  assert not transport_uint8(celeba)                  # resized: lossy
  celeba.data.pipeline = "native"
  assert transport_uint8(celeba)                      # pre-sized uint8


def test_uint8_transport_preprocess_equivalence():
  """The jitted preprocess fed a uint8 batch must reproduce the
  float-transport chain: bit-exact without dequantization, and to <=1
  ulp with it (the uint8 form (k+u)/256 has ONE f32 rounding where the
  float chain 255*(k/255)+u)/256 has three — run_lib._preprocess)."""
  import jax
  import jax.numpy as jnp

  rng = np.random.RandomState(3)
  u8 = rng.randint(0, 256, size=(4, 8, 8, 3), dtype=np.uint8)
  # the float the tf pipeline would have shipped (reciprocal multiply)
  f32 = u8.astype(np.float32) * np.float32(1.0 / 255.0)

  def pre_dequant(batch, k):
    if batch.dtype == jnp.uint8:
      batch = ((batch.astype(jnp.float32)
                + jax.random.uniform(k, batch.shape))
               * np.float32(1.0 / 256.0))
    else:
      batch = (255.0 * batch + jax.random.uniform(k, batch.shape)) / 256.0
    return batch * 2.0 - 1.0  # centered scaler

  def pre_plain(batch):
    if batch.dtype == jnp.uint8:
      batch = batch.astype(jnp.float32) * np.float32(1.0 / 255.0)
    return batch * 2.0 - 1.0

  k = jax.random.PRNGKey(11)
  a = np.asarray(jax.jit(pre_dequant)(jnp.asarray(u8), k))
  b = np.asarray(jax.jit(pre_dequant)(jnp.asarray(f32), k))
  # the float chain's three roundings can drift 2 ulp at the [-1,1]
  # scale (ulp = 2^-23 near |x|=1): bound at 4*2^-24
  np.testing.assert_allclose(a, b, rtol=0, atol=4 * 2.0**-24)

  # plain path: same ops on same bits, but XLA may fuse the scaler into
  # an FMA in one program shape and not the other — eager is bit-equal,
  # jit agrees to 1 ulp
  c_e = np.asarray(pre_plain(jnp.asarray(u8)))
  d_e = np.asarray(pre_plain(jnp.asarray(f32)))
  np.testing.assert_array_equal(c_e, d_e)
  c = np.asarray(jax.jit(pre_plain)(jnp.asarray(u8)))
  d = np.asarray(jax.jit(pre_plain)(jnp.asarray(f32)))
  np.testing.assert_allclose(c, d, rtol=0, atol=2.0**-23)


def test_synthetic_array_axon_only_fallback(monkeypatch):
  """On an axon-only process (the plugin registers no CPU PJRT client —
  observed in the wild: jax.local_devices(backend='cpu') raises
  RuntimeError), _synthetic_array must fall back to the pure-numpy host
  resize (no TF dependency) and produce data statistically identical to
  the jax path."""
  from soft_truncation_tpu.data import datasets as D

  config = default_config("cifar10")
  config.data.image_size = 16
  ref = D._synthetic_array(config, "test")

  orig_local_devices = jax.local_devices

  def no_cpu(*args, **kw):
    if kw.get("backend") == "cpu":
      raise RuntimeError("Unknown backend cpu. Available backends: axon")
    return orig_local_devices(*args, **kw)

  monkeypatch.setattr(D.jax, "local_devices", no_cpu)
  fb = D._synthetic_array(config, "test")
  assert fb.shape == ref.shape and fb.dtype == np.uint8
  # same RNG draws, only the bilinear implementation differs: half-pixel
  # upsample in both, so pixels agree to rounding
  assert np.mean(np.abs(fb.astype(int) - ref.astype(int)) <= 1) > 0.99
