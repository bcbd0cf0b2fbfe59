"""Sampling over the device mesh: the jitted PC sampler must produce
batch-sharded samples on the 8-device virtual CPU mesh (GSPMD data
parallelism for the eval/sampling path — the reference splits sampling
batches across GPUs only implicitly via DataParallel, models/utils.py:94).
"""

import jax
import jax.numpy as jnp
import numpy as np

from soft_truncation_tpu.configs.base import default_config, override
from soft_truncation_tpu.data import get_data_inverse_scaler
from soft_truncation_tpu.models import create_model
from soft_truncation_tpu.parallel import (batch_sharding, make_mesh,
                                          replicated_sharding)
from soft_truncation_tpu.sample import get_sampling_fn
from soft_truncation_tpu.sde import get_sde


def _tiny_config():
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
  return config


def test_pc_sampler_batch_sharded_over_mesh():
  config = _tiny_config()
  sde = get_sde(config)
  model = create_model(config)
  shape = (16, 8, 8, 3)

  x = jnp.zeros(shape)
  t = jnp.full((shape[0],), 1.0)
  params = model.init({"params": jax.random.PRNGKey(0)}, x, t,
                      train=False)["params"]

  mesh = make_mesh()
  rs = replicated_sharding(mesh)
  bs = batch_sharding(mesh)

  sampler = get_sampling_fn(config, sde, shape,
                            get_data_inverse_scaler(config),
                            eps=config.sampling.truncation_time)
  jitted = jax.jit(sampler, static_argnums=0,
                   in_shardings=(rs, None), out_shardings=(bs, None))

  params = jax.device_put(params, rs)
  samples, nfe = jitted(model, params, jax.random.PRNGKey(1))

  assert samples.shape == shape
  assert int(nfe) == sde.N * 2
  assert np.all(np.isfinite(np.asarray(samples)))
  # really sharded: one batch slice per device over the 'data' axis
  assert samples.sharding.is_equivalent_to(bs, ndim=samples.ndim)
  shard_shapes = {s.data.shape for s in samples.addressable_shards}
  assert shard_shapes == {(shape[0] // mesh.devices.size,) + shape[1:]}


def test_picard_sampler_batch_sharded_over_mesh():
  """The parallel-in-time Picard sampler (sample/parallel.py) must also
  run under GSPMD with the batch axis sharded — the window axis stays
  replicated (it is a vmap inside the program), each device holds its
  batch slice of every window position."""
  config = _tiny_config()
  config.sampling.method = "picard"
  config.sampling.picard_window = 2
  # tol=0: the exact fixed-point mode — tol>0 on this stochastic PC
  # chain is refused by the round-5 guard (sample/parallel.py).
  config.sampling.picard_tol = 0.0
  sde = get_sde(config)
  model = create_model(config)
  shape = (16, 8, 8, 3)

  x = jnp.zeros(shape)
  t = jnp.full((shape[0],), 1.0)
  params = model.init({"params": jax.random.PRNGKey(0)}, x, t,
                      train=False)["params"]

  mesh = make_mesh()
  rs = replicated_sharding(mesh)
  bs = batch_sharding(mesh)

  sampler = get_sampling_fn(config, sde, shape,
                            get_data_inverse_scaler(config),
                            eps=config.sampling.truncation_time)
  jitted = jax.jit(sampler, static_argnums=0,
                   in_shardings=(rs, None), out_shardings=(bs, None))

  samples, nfe = jitted(model, jax.device_put(params, rs),
                        jax.random.PRNGKey(1))

  assert samples.shape == shape
  assert 0 < int(nfe) <= sde.N * config.sampling.picard_window * 2
  assert np.all(np.isfinite(np.asarray(samples)))
  assert samples.sharding.is_equivalent_to(bs, ndim=samples.ndim)
  shard_shapes = {s.data.shape for s in samples.addressable_shards}
  assert shard_shapes == {(shape[0] // mesh.devices.size,) + shape[1:]}
