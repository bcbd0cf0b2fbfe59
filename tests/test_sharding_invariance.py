"""Sharding INVARIANCE: the jitted train step and samplers must produce
the same numbers on a 1-device mesh as on the 8-device mesh (and on the
2-D data+spatial mesh) for the same seed.

This is the GSPMD analogue of the reference's implicit guarantee that
torch DataParallel is numerically identical to single-GPU by construction
(models/utils.py:94): the partitioning must be an implementation detail,
not a semantics change. `jax_threefry_partitionable` (tests/conftest.py)
makes every jax.random draw inside the jitted program independent of the
sharding, so the only residual divergence is float reduction order in the
gradient all-reduce — covered by tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.data import get_data_inverse_scaler
from soft_truncation_tpu.losses import get_optimizer
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.parallel import (batch_sharding, make_mesh,
                                          replicated_sharding)
from soft_truncation_tpu.sample import get_sampling_fn
from soft_truncation_tpu.sde import get_sde
from soft_truncation_tpu.train import init_train_state, make_train_step


def _tiny_train_config():
  config = default_config("cifar10")
  override(config, {
      "training": dict(sde="vpsde", continuous=True, reduce_mean=True,
                       st=True, k=1.0, likelihood_weighting=False,
                       truncation_time=1e-5, batch_size=16),
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


def _run_train_step(config, mesh, spatial=False):
  sde = get_sde(config)
  model = create_model(config)
  tx = get_optimizer(config)
  state = init_train_state(jax.random.PRNGKey(0), config, model, tx)
  step_fn = make_train_step(config, sde, model, tx)

  rs = replicated_sharding(mesh)
  bs = batch_sharding(mesh, spatial=spatial)
  jitted = jax.jit(step_fn, in_shardings=(rs, bs, rs),
                   out_shardings=(rs, rs))
  size = config.data.image_size
  batch = jax.device_put(
      jax.random.uniform(jax.random.PRNGKey(1),
                         (config.training.batch_size, size, size, 3))
      * 2 - 1, bs)
  state = jax.device_put(state, rs)
  state, losses = jitted(state, batch, jax.random.PRNGKey(2))
  return (jax.tree.map(np.asarray, state.params), np.asarray(losses))


def _max_param_diff(p1, p2):
  diffs = jax.tree.map(lambda a, b: float(np.max(np.abs(a - b))), p1, p2)
  return max(jax.tree.leaves(diffs))


def test_train_step_1_vs_8_devices():
  config = _tiny_train_config()
  params1, losses1 = _run_train_step(config, make_mesh(
      devices=jax.devices()[:1]))
  params8, losses8 = _run_train_step(config, make_mesh())

  # per-example losses involve no cross-device reduction: near-exact
  np.testing.assert_allclose(losses1, losses8, rtol=1e-5, atol=1e-6)
  # params after one step differ only by all-reduce summation order
  assert _max_param_diff(params1, params8) < 1e-5


def test_train_step_1_vs_2d_mesh():
  config = _tiny_train_config()
  params1, losses1 = _run_train_step(config, make_mesh(
      devices=jax.devices()[:1]))
  params2d, losses2d = _run_train_step(
      config, make_mesh(mesh_shape=(4, 2)), spatial=True)

  np.testing.assert_allclose(losses1, losses2d, rtol=1e-5, atol=1e-6)
  assert _max_param_diff(params1, params2d) < 1e-5


def test_train_step_1_vs_2d_mesh_64px():
  """Spatial sharding validated ABOVE toy resolution: at 64² with the
  'space' axis of size 2, each device holds 32 image rows, so every 3x3
  conv (and the 32²-resolution attention block) crosses the shard
  boundary and GSPMD must insert real halo exchanges / gathers. The 8x8
  tests above keep halos inside one padding ring; this pins the halo
  logic where it actually spans blocks."""
  config = _tiny_train_config()
  override(config, {
      "training": dict(batch_size=8),
      "optim": dict(num_micro_batch=2),
      "data": dict(image_size=64),
      "model": dict(attn_resolutions=(32,)),
  })
  params1, losses1 = _run_train_step(config, make_mesh(
      devices=jax.devices()[:1]))
  params2d, losses2d = _run_train_step(
      config, make_mesh(mesh_shape=(4, 2)), spatial=True)

  np.testing.assert_allclose(losses1, losses2d, rtol=1e-5, atol=1e-6)
  assert _max_param_diff(params1, params2d) < 1e-5


def test_train_step_1_vs_2d_mesh_256px_uncsnpp():
  """High-res spatial-sharding certification (SURVEY section 2.3 SP row):
  a 256² UNCSN++ step (fir resampling, progressive_input='residual',
  reciprocal-VE SDE — the uncsnpp_st knob set, ve/CIFAR10/uncsnpp_st.py
  scaled to toy width) over the 2-D (data=4, space=2) mesh. With 128
  image rows per space shard, every FIR up/downfirdn, 3x3 conv, and the
  32²-resolution attention block crosses the shard boundary through four
  resolution levels, so this pins GSPMD halo exchange + gather logic at
  the resolution the reference's CelebA-HQ/FFHQ-class configs actually
  run (reference torch DataParallel has no spatial analogue; this is the
  TPU-native extension). Losses must be finite and match 1 device."""
  config = _tiny_train_config()
  override(config, {
      "training": dict(sde="reciprocal_vesde", st=True, batch_size=4,
                       model_mode="reciprocal", eta=0.001,
                       importance_sampling=False,
                       likelihood_weighting=False),
      "optim": dict(num_micro_batch=1),
      "data": dict(image_size=256, centered=False),
      "model": dict(
          scale_by_sigma=True, fir=True, fir_kernel=[1, 3, 3, 1],
          ch_mult=(1, 1, 2, 2), num_res_blocks=1,
          attn_resolutions=(32,), progressive_input="residual",
          sigma_min=0.001),
  })
  params1, losses1 = _run_train_step(config, make_mesh(
      devices=jax.devices()[:1]))
  assert np.all(np.isfinite(losses1))
  params2d, losses2d = _run_train_step(
      config, make_mesh(mesh_shape=(4, 2)), spatial=True)

  np.testing.assert_allclose(losses1, losses2d, rtol=1e-5, atol=1e-6)
  assert _max_param_diff(params1, params2d) < 1e-5


def _tiny_sample_config(method):
  config = default_config("cifar10")
  override(config, {
      "training": dict(sde="vesde", continuous=True),
      "data": dict(image_size=8, centered=False),
      "sampling": dict(method="pc", predictor="reverse_diffusion",
                       corrector="langevin", snr=0.16, n_steps_each=1,
                       probability_flow=False, noise_removal=True),
      "model": dict(
          name="ncsnpp", scale_by_sigma=True, ema_rate=0.999,
          normalization="GroupNorm", nonlinearity="swish", nf=8,
          ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(4,),
          resamp_with_conv=True, conditional=True, fir=False,
          fir_kernel=[1, 3, 3, 1], skip_rescale=True,
          resblock_type="biggan", progressive="none",
          progressive_input="none", progressive_combine="sum",
          init_scale=0.0, embedding_type="fourier", fourier_scale=16,
          num_scales=4),
  })
  config.sampling.method = method
  if method == "dpm_solver":
    config.sampling.dpm_steps = 4
  return config


def _run_sampler(config, mesh):
  sde = get_sde(config)
  model = create_model(config)
  shape = (16, 8, 8, 3)
  x = jnp.zeros(shape)
  t = jnp.full((shape[0],), 1.0)
  params = model.init({"params": jax.random.PRNGKey(0)}, x, t,
                      train=False)["params"]
  rs = replicated_sharding(mesh)
  bs = batch_sharding(mesh)
  sampler = get_sampling_fn(config, sde, shape,
                            get_data_inverse_scaler(config),
                            eps=config.sampling.truncation_time)
  jitted = jax.jit(sampler, static_argnums=0,
                   in_shardings=(rs, None), out_shardings=(bs, None))
  samples, nfe = jitted(model, jax.device_put(params, rs),
                        jax.random.PRNGKey(1))
  return np.asarray(samples)


def test_pc_sampler_1_vs_8_devices():
  config = _tiny_sample_config("pc")
  s1 = _run_sampler(config, make_mesh(devices=jax.devices()[:1]))
  s8 = _run_sampler(config, make_mesh())
  # random-weights VE trajectories reach O(1e6) magnitudes; differences
  # are pure float accumulation over the 8-eval chain (observed max
  # relative ~1e-4 on 0.4% of elements)
  np.testing.assert_allclose(s1, s8, rtol=5e-4)


def test_dpm_sampler_1_vs_8_devices():
  config = _tiny_sample_config("dpm_solver")
  s1 = _run_sampler(config, make_mesh(devices=jax.devices()[:1]))
  s8 = _run_sampler(config, make_mesh())
  np.testing.assert_allclose(s1, s8, rtol=1e-5, atol=1e-6)
