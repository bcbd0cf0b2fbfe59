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
    assert float(batch.max()) <= 1.0
    # eval dataset is a single epoch of 32 items
    n = sum(len(b["image"]) for b in eval_ds.as_numpy_iterator())
    assert n == 32


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
