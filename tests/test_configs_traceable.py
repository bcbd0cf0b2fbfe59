"""Every released experiment config must TRACE its full training step —
SDE construction, full-size model init, loss, optimizer, EMA — via
jax.eval_shape (abstract evaluation: catches config/model/loss
incompatibilities in every config without compiling anything).

The reference has no equivalent guarantee: several of its own code paths
crash at construction (PARITY.md known-bug list), and nothing exercises
a config until someone trains it.
"""

import importlib.util
import json
import os

import jax
import jax.numpy as jnp
import pytest

from soft_truncation_tpu.losses import get_optimizer
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.sde import get_sde
from soft_truncation_tpu.train import init_train_state, make_train_step

GOLD_PATH = os.path.join(os.path.dirname(__file__), "golden",
                         "configs_golden.json")
with open(GOLD_PATH) as f:
  CONFIG_FILES = sorted(json.load(f))

CFG_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "soft_truncation_tpu", "configs")


def _load(rel):
  path = os.path.join(CFG_DIR, rel)
  spec = importlib.util.spec_from_file_location(
      "cfg_" + rel.replace("/", "_").replace("-", "_").replace(".", "_"),
      path)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod.get_config()


@pytest.mark.parametrize("rel", CONFIG_FILES)
def test_config_train_step_traces(rel):
  config = _load(rel)
  # tiny batch: tracing cost is shape-independent in batch, and the
  # reference micro-batching requires divisibility
  config.optim.num_micro_batch = min(config.optim.num_micro_batch, 2)
  config.training.batch_size = 2 * config.optim.num_micro_batch

  sde = get_sde(config)
  model = create_model(config)
  tx = get_optimizer(config)

  state_shapes = jax.eval_shape(
      lambda key: init_train_state(key, config, model, tx),
      jax.random.PRNGKey(0))
  n_params = sum(
      int(jnp.prod(jnp.asarray(l.shape)))
      for l in jax.tree_util.tree_leaves(state_shapes.params))
  assert n_params > 1e6, (rel, n_params)  # full-size model, not a stub

  step_fn = make_train_step(config, sde, model, tx)
  size = config.data.image_size
  batch = jax.ShapeDtypeStruct(
      (config.training.batch_size, size, size, config.data.num_channels),
      jnp.float32)
  new_state, losses = jax.eval_shape(
      step_fn, state_shapes, batch, jax.ShapeDtypeStruct((2,), jnp.uint32))
  expect_b = config.training.batch_size
  if config.training.get("mixed", False):
    expect_b //= 2
  assert losses.shape == (expect_b,), (rel, losses.shape)
  assert new_state.params is not None


@pytest.mark.parametrize("rel", CONFIG_FILES)
def test_config_sampler_traces(rel):
  """The eval path too: each config's CONFIGURED sampler (method,
  predictor, corrector, truncation) must trace end to end."""
  from soft_truncation_tpu.sample import get_sampling_fn

  config = _load(rel)
  sde = get_sde(config)
  model = create_model(config)
  tx = get_optimizer(config)
  params = jax.eval_shape(
      lambda key: init_train_state(key, config, model, tx),
      jax.random.PRNGKey(0)).params

  size = config.data.image_size
  shape = (2, size, size, config.data.num_channels)
  config.sampling.chunk = 0  # single-scan form for one eval_shape call
  sampler = get_sampling_fn(config, sde, shape, lambda x: x,
                            eps=config.sampling.truncation_time)
  samples, _ = jax.eval_shape(lambda p, k: sampler(model, p, k),
                              params, jax.ShapeDtypeStruct((2,), jnp.uint32))
  assert samples.shape == shape, (rel, samples.shape)
