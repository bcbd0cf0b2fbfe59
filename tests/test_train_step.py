"""End-to-end train step tests on the 8-device virtual CPU mesh."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.losses import get_optimizer
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.parallel import (batch_sharding, make_mesh,
                                          replicated_sharding, shard_batch)
from soft_truncation_tpu.sde import get_sde
from soft_truncation_tpu.train import (CheckpointManager, TrainState,
                                       init_train_state, make_train_step)


def tiny_train_config(**training_overrides):
  config = default_config("cifar10")
  training = dict(sde="vpsde", continuous=True, reduce_mean=True, st=True,
                  k=1.0, likelihood_weighting=False, truncation_time=1e-5,
                  batch_size=16)
  training.update(training_overrides)
  override(config, {
      "training": training,
      "optim": dict(num_micro_batch=2, warmup=10),
      "data": dict(image_size=8, centered=True),
      "model": dict(
          name="ncsnpp", scale_by_sigma=False, ema_rate=0.999,
          normalization="GroupNorm", nonlinearity="swish", nf=8,
          ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(4,),
          resamp_with_conv=True, conditional=True, fir=False,
          fir_kernel=[1, 3, 3, 1], skip_rescale=True,
          resblock_type="biggan", progressive="none",
          progressive_input="none", progressive_combine="sum",
          init_scale=0.0, embedding_type="fourier", fourier_scale=16),
  })
  return config


def build(config):
  sde = get_sde(config)
  model = create_model(config)
  tx = get_optimizer(config)
  state = init_train_state(jax.random.PRNGKey(0), config, model, tx)
  step_fn = make_train_step(config, sde, model, tx)
  return sde, model, tx, state, step_fn


def test_train_step_runs_and_learns():
  config = tiny_train_config()
  _, _, _, state, step_fn = build(config)
  mesh = make_mesh()
  assert mesh.devices.size == 8

  rs = replicated_sharding(mesh)
  bs = batch_sharding(mesh)
  jitted = jax.jit(step_fn,
                   in_shardings=(rs, bs, rs),
                   out_shardings=(rs, rs),
                   donate_argnums=0)

  batch = jax.random.uniform(jax.random.PRNGKey(1), (16, 8, 8, 3)) * 2 - 1
  batch = shard_batch(mesh, batch)

  losses0 = None
  for i in range(5):
    state, losses = jitted(state, batch,
                           jax.random.PRNGKey(100 + i))
    assert losses.shape == (16,)
    assert bool(jnp.all(jnp.isfinite(losses)))
    if losses0 is None:
      losses0 = float(jnp.mean(losses))
  assert int(state.step) == 5
  # params must differ from EMA (warmup decay keeps EMA close to params
  # but not equal after several steps)
  p = jax.tree.leaves(state.params)[0]
  e = jax.tree.leaves(state.ema_params)[0]
  assert p.shape == e.shape


def test_train_step_mixed():
  config = tiny_train_config(mixed=True, ddpm_weight=0.1, balanced=True,
                             importance_sampling=False)
  _, _, _, state, step_fn = build(config)
  batch = jax.random.uniform(jax.random.PRNGKey(1), (16, 8, 8, 3)) * 2 - 1
  state, losses = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(2))
  # mixed step returns B/2 per-example losses (reference losses.py:303)
  assert losses.shape == (8,)
  assert bool(jnp.all(jnp.isfinite(losses)))


def test_train_step_discrete_ddpm():
  config = tiny_train_config(continuous=False, st=False,
                             likelihood_weighting=False)
  _, _, _, state, step_fn = build(config)
  batch = jax.random.uniform(jax.random.PRNGKey(1), (16, 8, 8, 3)) * 2 - 1
  state, losses = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(2))
  assert losses.shape == (16,)
  assert bool(jnp.all(jnp.isfinite(losses)))


def test_checkpoint_roundtrip():
  config = tiny_train_config()
  _, _, _, state, step_fn = build(config)
  batch = jax.random.uniform(jax.random.PRNGKey(1), (16, 8, 8, 3)) * 2 - 1
  state, _ = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(2))

  with tempfile.TemporaryDirectory() as workdir:
    mgr = CheckpointManager(workdir)
    assert mgr.restore_meta(state) is None  # nothing yet -> graceful
    mgr.save_meta(state)
    mgr.save_snapshot(state, save_step=1)

    template = jax.tree.map(jnp.zeros_like, state)
    restored = mgr.restore_meta(template)
    assert restored is not None
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert mgr.latest_snapshot_step() == 1

    # rolling overwrite
    mgr.save_meta(restored)
    again = mgr.restore_meta(template)
    assert int(again.step) == int(state.step)


def test_multi_step_window_matches_single_steps():
  """A steps_per_dispatch window (make_multi_train_step) draws the same
  randomness as K single-dispatch steps (identical key chain — the
  advanced key must match EXACTLY) and produces the same numerics up to
  XLA fusion/reassociation differences between the two programs."""
  from soft_truncation_tpu.train import make_multi_train_step

  config = tiny_train_config()
  sde = get_sde(config)
  model = create_model(config)
  tx = get_optimizer(config)
  state = init_train_state(jax.random.PRNGKey(0), config, model, tx)

  def preprocess(b, k):
    return (255.0 * b + jax.random.uniform(k, b.shape)) / 256.0 * 2 - 1

  single = jax.jit(make_train_step(config, sde, model, tx))
  multi = jax.jit(make_multi_train_step(config, sde, model, tx,
                                        preprocess=preprocess))

  kk = 4
  batches = jax.random.uniform(
      jax.random.PRNGKey(1), (kk, 16, 8, 8, 3))
  key = jax.random.PRNGKey(7)

  s1, k1 = state, key
  eager_losses = []
  for i in range(kk):
    k1, k_pre, k_step = jax.random.split(k1, 3)
    s1, l = single(s1, preprocess(batches[i], k_pre), k_step)
    eager_losses.append(np.asarray(l))

  s2, k2, win_losses = multi(state, batches, key)

  np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
  np.testing.assert_allclose(np.stack(eager_losses),
                             np.asarray(win_losses), rtol=2e-6, atol=1e-6)
  for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-6, atol=1e-7)
  assert int(s2.step) == kk

  # width-1 windows take the straight-line (no-scan) branch: chaining kk
  # of them must match the kk-window scan — key chain EXACTLY, numerics
  # to program-fusion tolerance
  s3, k3 = state, key
  losses1 = []
  for i in range(kk):
    s3, k3, l1 = multi(s3, batches[i:i + 1], k3)
    losses1.append(np.asarray(l1)[0])
  np.testing.assert_array_equal(np.asarray(k3), np.asarray(k2))
  np.testing.assert_allclose(np.stack(losses1),
                             np.asarray(win_losses), rtol=2e-6, atol=1e-6)
  for a, b in zip(jax.tree.leaves(s3.params), jax.tree.leaves(s2.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-6, atol=1e-7)


def test_abstract_template_matches_concrete_and_restores():
  """init_train_state(abstract=True) must mirror the concrete pytree
  (same treedef/shapes/dtypes) and work as an Orbax restore template —
  eval mode uses it to skip the device init (run_lib._build_everything)."""
  config = tiny_train_config()
  sde = get_sde(config)
  model = create_model(config)
  tx = get_optimizer(config)
  concrete = init_train_state(jax.random.PRNGKey(0), config, model, tx)
  abstract = init_train_state(jax.random.PRNGKey(0), config, model, tx,
                              abstract=True)

  c_leaves, c_def = jax.tree.flatten(concrete)
  a_leaves, a_def = jax.tree.flatten(abstract)
  assert c_def == a_def
  for c, a in zip(c_leaves, a_leaves):
    assert jnp.shape(c) == jnp.shape(a)
    assert jnp.result_type(c) == jnp.result_type(a)
  # no device arrays anywhere in the abstract template
  assert all(isinstance(a, jax.ShapeDtypeStruct) for a in a_leaves)

  with tempfile.TemporaryDirectory() as workdir:
    mgr = CheckpointManager(workdir)
    mgr.save_meta(concrete)
    restored = mgr.restore_meta(abstract)
    for a, b in zip(jax.tree.leaves(concrete), jax.tree.leaves(restored)):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  # bf16 EMA shadow flows through to the abstract template too
  config.tpu.ema_dtype = "bfloat16"
  abstract_bf16 = init_train_state(jax.random.PRNGKey(0), config, model, tx,
                                   abstract=True)
  assert all(l.dtype == jnp.bfloat16
             for l in jax.tree.leaves(abstract_bf16.ema_params))


def test_training_reduces_loss():
  """150 steps on a fixed synthetic dataset must reduce the score loss.
  The IS-weighted objective is high-variance across sampled diffusion
  times, so compare 25-step window means and require a clear (>6%) drop."""
  config = tiny_train_config(st=False)
  config.optim.num_micro_batch = 1
  config.optim.warmup = 50
  _, _, _, state, step_fn = build(config)
  jitted = jax.jit(step_fn, donate_argnums=0)
  data = jax.random.uniform(jax.random.PRNGKey(7), (64, 8, 8, 3)) * 2 - 1
  key = jax.random.PRNGKey(8)
  first, last = [], []
  for i in range(150):
    key, kb, ks = jax.random.split(key, 3)
    idx = jax.random.randint(kb, (16,), 0, 64)
    state, losses = jitted(state, data[idx], ks)
    m = float(jnp.mean(losses))
    if i < 25:
      first.append(m)
    if i >= 125:
      last.append(m)
  assert np.mean(last) < 0.94 * np.mean(first), (np.mean(first),
                                                 np.mean(last))


def test_lr_warmup_schedule():
  from soft_truncation_tpu.losses import lr_schedule
  config = tiny_train_config()
  sched = lr_schedule(config)
  assert float(sched(0)) == 0.0
  assert float(sched(5)) == pytest.approx(config.optim.lr * 0.5)
  assert float(sched(10)) == pytest.approx(config.optim.lr)
  assert float(sched(100)) == pytest.approx(config.optim.lr)


def test_synthetic_data_pipeline():
  from soft_truncation_tpu.data import get_dataset, get_batch, \
      get_data_scaler, get_data_inverse_scaler
  config = tiny_train_config()
  config.data.dataset = "CIFAR10"
  config.training.batch_size = 8
  config.eval.batch_size = 8
  train_ds, eval_ds = get_dataset(config)
  it = iter(train_ds.as_numpy_iterator())
  batch, it = get_batch(config, it, train_ds)
  assert batch.shape == (8, 8, 8, 3)
  assert float(batch.min()) >= 0.0 and float(batch.max()) <= 1.0
  scaler = get_data_scaler(config)
  inv = get_data_inverse_scaler(config)
  np.testing.assert_allclose(np.asarray(inv(scaler(batch))),
                             np.asarray(batch), rtol=1e-6)
