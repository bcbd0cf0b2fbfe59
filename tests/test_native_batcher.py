"""Native (C++) batch assembler: build, semantics, determinism, speed."""

import numpy as np
import pytest

from soft_truncation_tpu.data.native import NativeBatcher, get_lib


@pytest.fixture(scope="module")
def dataset():
  rng = np.random.RandomState(0)
  return rng.randint(0, 256, size=(256, 8, 8, 3), dtype=np.uint8)


def test_native_lib_builds():
  assert get_lib() is not None, "g++ build of the native batcher failed"


def test_batch_shapes_and_ranges(dataset):
  b = NativeBatcher(dataset, batch_size=32, random_flip=True,
                    uniform_dequant=True, centered=True, seed=1)
  batch = next(b)
  assert batch.shape == (32, 8, 8, 3)
  assert batch.dtype == np.float32
  assert batch.min() >= -1.0 and batch.max() <= 1.0


def test_no_aug_is_exact_gather(dataset):
  b = NativeBatcher(dataset, batch_size=16, random_flip=False,
                    uniform_dequant=False, centered=False, seed=2)
  idx = np.arange(16, dtype=np.int64)
  batch = b.assemble(idx, seed=0)
  np.testing.assert_allclose(batch, dataset[:16].astype(np.float32) / 255.0,
                             rtol=1e-6)


def test_flip_only_flips_rows(dataset):
  b = NativeBatcher(dataset, batch_size=64, random_flip=True,
                    uniform_dequant=False, centered=False, seed=3)
  idx = np.arange(64, dtype=np.int64)
  batch = b.assemble(idx, seed=123)
  plain = dataset[:64].astype(np.float32) / 255.0
  flipped = plain[:, :, ::-1, :]
  n_plain = n_flip = 0
  for i in range(64):
    if np.allclose(batch[i], plain[i]):
      n_plain += 1
    elif np.allclose(batch[i], flipped[i]):
      n_flip += 1
  assert n_plain + n_flip == 64
  assert n_plain > 8 and n_flip > 8  # both outcomes occur


def test_deterministic(dataset):
  b = NativeBatcher(dataset, batch_size=16, uniform_dequant=True, seed=4)
  idx = np.arange(16, dtype=np.int64)
  a = b.assemble(idx, seed=7)
  c = b.assemble(idx, seed=7)
  np.testing.assert_array_equal(a, c)
  d = b.assemble(idx, seed=8)
  assert not np.array_equal(a, d)


def test_dequant_statistics(dataset):
  b = NativeBatcher(dataset, batch_size=128, random_flip=False,
                    uniform_dequant=True, centered=False, seed=5)
  idx = np.arange(128, dtype=np.int64)
  batch = b.assemble(idx, seed=11)
  base = dataset[:128].astype(np.float32)
  # dequant: (v + u)/256 with u~U[0,1): error within [0, 1/256)
  delta = batch * 256.0 - base
  assert delta.min() >= 0.0 and delta.max() < 1.0
  assert 0.3 < delta.mean() < 0.7  # ~0.5


def test_epoch_covers_all_indices(dataset):
  b = NativeBatcher(dataset, batch_size=64, random_flip=False, seed=6)
  seen = []
  for _ in range(4):  # 4*64 == len(dataset): one epoch
    next(b)
  assert b._epoch == 1
  assert sorted(b._indices.tolist()) == list(range(256))


def test_matches_numpy_semantics(dataset):
  """Value semantics (not RNG streams): without stochastic ops the numpy
  fallback and native path agree exactly."""
  idx = np.arange(32, dtype=np.int64)
  nat = NativeBatcher(dataset, 32, random_flip=False, uniform_dequant=False,
                      centered=True, seed=7)
  npy = NativeBatcher(dataset, 32, random_flip=False, uniform_dequant=False,
                      centered=True, seed=7, force_numpy=True)
  np.testing.assert_allclose(nat.assemble(idx, 0), npy.assemble(idx, 0),
                             rtol=1e-6)


def test_throughput_vs_numpy(dataset):
  """The native path should not be slower than numpy (usually much
  faster for large batches with augmentation)."""
  import time
  big = np.tile(dataset, (8, 1, 1, 1))
  idx = np.arange(512, dtype=np.int64)
  nat = NativeBatcher(big, 512, random_flip=True, uniform_dequant=True,
                      centered=True, seed=8)
  npy = NativeBatcher(big, 512, random_flip=True, uniform_dequant=True,
                      centered=True, seed=8, force_numpy=True)
  nat.assemble(idx, 0)  # warm
  t0 = time.perf_counter()
  for i in range(5):
    nat.assemble(idx, i)
  t_nat = time.perf_counter() - t0
  t0 = time.perf_counter()
  for i in range(5):
    npy.assemble(idx, i)
  t_np = time.perf_counter() - t0
  assert t_nat < t_np * 1.5, (t_nat, t_np)


def test_native_pipeline_wired_into_get_dataset(tmp_path, monkeypatch):
  """config.data.pipeline='native' must resolve through get_dataset and
  feed run_lib-shaped batches (train: infinite shuffled; eval: one pass)."""
  from soft_truncation_tpu.configs.base import default_config
  from soft_truncation_tpu.data import datasets as D

  rng = np.random.RandomState(0)
  imgs = rng.randint(0, 256, size=(64, 8, 8, 3), dtype=np.uint8)
  np.savez(tmp_path / "cifar10_train.npz", images=imgs)
  np.savez(tmp_path / "cifar10_test.npz", images=imgs[:32])
  monkeypatch.setenv("SOFT_TRUNCATION_DATA_DIR", str(tmp_path))

  config = default_config("cifar10")
  config.data.pipeline = "native"
  config.data.image_size = 8
  config.training.batch_size = 16
  config.eval.batch_size = 16

  train_ds, eval_ds = D.get_dataset(config)
  it = iter(train_ds.as_numpy_iterator())
  batch, it = D.get_batch(config, it, train_ds)
  assert batch.shape == (16, 8, 8, 3)
  # native pipeline is always uint8-transport-eligible (pre-sized uint8
  # arrays): train batches arrive as uint8, converted on device
  assert batch.dtype == np.uint8

  eval_batches = list(eval_ds.as_numpy_iterator())
  assert len(eval_batches) == 2  # 32 eval images / 16
  np.testing.assert_allclose(eval_batches[0]["image"],
                             imgs[:16].astype(np.float32) / 255.0)


def test_native_pipeline_train_smoke(tmp_path, monkeypatch):
  """Two real train steps through run_lib with the native pipeline."""
  from test_eval_and_runlib import _pipeline_config
  from soft_truncation_tpu import run_lib

  rng = np.random.RandomState(1)
  imgs = rng.randint(0, 256, size=(64, 8, 8, 3), dtype=np.uint8)
  workdir = tmp_path / "wd"
  np.savez(tmp_path / "cifar10_train.npz", images=imgs)
  np.savez(tmp_path / "cifar10_test.npz", images=imgs[:32])
  monkeypatch.setenv("SOFT_TRUNCATION_DATA_DIR", str(tmp_path))

  config = _pipeline_config()
  config.data.pipeline = "native"
  config.training.n_iters = 2
  config.eval.enable_bpd = False
  state = run_lib.train(config, str(workdir), assetdir=None)
  assert int(state.step) == 3
