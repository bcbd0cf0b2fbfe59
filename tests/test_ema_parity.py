"""Numeric EMA parity vs the reference ExponentialMovingAverage
(models/ema.py:10-52): identical shadow trajectories over several updates
through the warmup-decay regime min(decay, (1+n)/(10+n))."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference"):
  pytest.skip("reference checkout not mounted",
              allow_module_level=True)
sys.path.insert(0, "/root/reference")
import jax.numpy as jnp  # noqa: E402

from models.ema import ExponentialMovingAverage  # noqa: E402  (reference)
from soft_truncation_tpu.models.ema import ema_update

N_STEPS = 25  # crosses the warmup boundary: (1+n)/(10+n) > 0.7 needs n > 20


def test_ema_trajectory_parity():
  rng = np.random.RandomState(2)
  p0 = rng.randn(3, 4).astype(np.float32)
  decay = 0.7  # low so warmup decay stops binding within N_STEPS

  p_t = torch.nn.Parameter(torch.from_numpy(p0.copy()))
  ref_ema = ExponentialMovingAverage([p_t], decay=decay)

  ema = {"w": jnp.asarray(p0)}
  params_np = p0.copy()

  for n in range(1, N_STEPS + 1):
    step_delta = rng.randn(3, 4).astype(np.float32) * 0.1
    params_np = params_np + step_delta
    with torch.no_grad():
      p_t.copy_(torch.from_numpy(params_np))
    ref_ema.update([p_t])

    ema = ema_update(ema, {"w": jnp.asarray(params_np)}, decay, n)
    np.testing.assert_allclose(np.asarray(ema["w"]),
                               ref_ema.shadow_params[0].numpy(),
                               rtol=1e-6, atol=1e-7, err_msg=f"update {n}")
