"""Seed reproducibility: two train runs with the same config.seed produce
bit-identical loss trajectories and final params.

The reference sets config.seed = 42 but never applies it anywhere (no
torch.manual_seed in the repo — SURVEY.md section 2.4): its training is
unreproducible by construction. Here every random draw descends from
PRNGKey(config.seed), so this is a hard guarantee worth pinning.
"""

import numpy as np

from tests.test_train_step import tiny_train_config

import jax
import jax.numpy as jnp

from soft_truncation_tpu.losses import get_optimizer
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.sde import get_sde
from soft_truncation_tpu.train import init_train_state, make_train_step


def _run(config, n_steps=4):
  sde = get_sde(config)
  model = create_model(config)
  tx = get_optimizer(config)
  state = init_train_state(jax.random.PRNGKey(config.seed), config, model,
                           tx)
  step_fn = jax.jit(make_train_step(config, sde, model, tx))
  key = jax.random.PRNGKey(config.seed)
  # data draws also descend from the same root key
  data_key, key = jax.random.split(key)
  batches = jax.random.uniform(
      data_key,
      (n_steps, config.training.batch_size, config.data.image_size,
       config.data.image_size, 3)) * 2 - 1
  losses_all = []
  for i in range(n_steps):
    key, k = jax.random.split(key)
    state, losses = step_fn(state, batches[i], k)
    losses_all.append(np.asarray(losses))
  return np.stack(losses_all), state


def test_same_seed_bit_identical():
  config = tiny_train_config()
  l1, s1 = _run(config)
  l2, s2 = _run(config)
  np.testing.assert_array_equal(l1, l2)
  leaves1 = jax.tree_util.tree_leaves(s1.params)
  leaves2 = jax.tree_util.tree_leaves(s2.params)
  for a, b in zip(leaves1, leaves2):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_different_seed_differs():
  config = tiny_train_config()
  l1, _ = _run(config, n_steps=2)
  config.seed = config.seed + 1
  l2, _ = _run(config, n_steps=2)
  assert not np.array_equal(l1, l2)
