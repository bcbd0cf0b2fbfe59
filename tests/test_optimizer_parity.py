"""Numeric parity of the optimizer stack (Adam/AdamW + linear LR warmup +
global-norm grad clipping) vs the reference torch implementation
(losses.py:29-58), stepped side by side on identical params/grads.

Covers the warmup ramp (including the reference's step-0 zero-lr
update), active clipping (grad norm > grad_clip), and both optimizers.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import os
import sys  # noqa: E402

if not os.path.isdir("/root/reference"):
  pytest.skip("reference checkout not mounted",
              allow_module_level=True)
sys.path.insert(0, "/root/reference")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

import losses as ref_losses  # noqa: E402  (reference)
from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.losses import get_optimizer

N_STEPS = 6


def make_config(optimizer):
  config = default_config("cifar10")
  override(config, {"optim": dict(optimizer=optimizer, lr=2e-4, beta1=0.9,
                                  eps=1e-8, weight_decay=0.0, grad_clip=1.0,
                                  warmup=3, amsgrad=False)})
  return config


@pytest.mark.parametrize("optimizer", ["Adam", "AdamW"])
def test_optimizer_stack_parity(optimizer):
  config = make_config(optimizer)
  rng = np.random.RandomState(5)
  p0 = rng.randn(4, 3).astype(np.float32)
  # gradient norms straddle grad_clip=1.0 so clipping activates on some
  # steps and not others
  grads = [rng.randn(4, 3).astype(np.float32) * s
           for s in (0.05, 3.0, 0.1, 5.0, 0.2, 2.0)]

  # --- reference torch stack ---
  p_t = torch.nn.Parameter(torch.from_numpy(p0.copy()))
  opt = ref_losses.get_optimizer(config, [p_t])
  optimize_fn = ref_losses.optimization_manager(config)
  torch_traj = []
  for step in range(N_STEPS):
    opt.zero_grad()
    p_t.grad = torch.from_numpy(grads[step].copy())
    optimize_fn(opt, [p_t], step=step)
    torch_traj.append(p_t.detach().numpy().copy())

  # --- our optax stack ---
  tx = get_optimizer(config)
  params = {"w": jnp.asarray(p0)}
  opt_state = tx.init(params)
  ours_traj = []
  for step in range(N_STEPS):
    g = {"w": jnp.asarray(grads[step])}
    updates, opt_state = tx.update(g, opt_state, params)
    params = optax.apply_updates(params, updates)
    ours_traj.append(np.asarray(params["w"]))

  for step in range(N_STEPS):
    np.testing.assert_allclose(ours_traj[step], torch_traj[step],
                               rtol=1e-5, atol=1e-7,
                               err_msg=f"step {step}")
