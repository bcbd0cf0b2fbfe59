"""Worker for tests/test_multihost.py: one simulated host in a 2-process
jax.distributed CPU cluster.

Phases (argv[5], default "data"):
  data        — per-host ``ds.shard`` disjointness + one data-parallel
                train step over the GLOBAL mesh (SURVEY.md §4 item 5).
  ckpt_save   — one global train step, then save the rolling preemption
                checkpoint (CheckpointManager.save_meta) from BOTH
                processes — the multi-host analogue of the reference's
                preemption path (utils.py:13-36, run_lib.py:82-83).
  ckpt_resume — fresh processes restore that checkpoint, verify the step
                counter and parameter bytes survived the round trip, and
                continue stepping over the global mesh.

Usage (spawned by the test):
  python multihost_worker.py <coord_addr> <num_procs> <proc_id> <outdir>
                             [phase]
"""

import sys


def _build(config_overrides=None):
  from soft_truncation_tpu.configs.base import default_config, override
  config = default_config("cifar10")
  override(config, {
      "training": dict(sde="vpsde", continuous=True, reduce_mean=True,
                       st=True, k=1.0, likelihood_weighting=False,
                       truncation_time=1e-5, batch_size=8),
      "optim": dict(num_micro_batch=1, warmup=2),
      # random_flip off so host fingerprints are raw source images
      "data": dict(image_size=8, centered=True, random_flip=False),
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
  if config_overrides:
    override(config, config_overrides)
  return config


def _setup_step(config):
  import jax
  from soft_truncation_tpu.losses import get_optimizer
  from soft_truncation_tpu.models import create_model
  from soft_truncation_tpu.parallel import (batch_sharding, make_mesh,
                                            replicated_sharding)
  from soft_truncation_tpu.sde import get_sde
  from soft_truncation_tpu.train import init_train_state, make_train_step

  sde = get_sde(config)
  model = create_model(config)
  tx = get_optimizer(config)
  state = init_train_state(jax.random.PRNGKey(0), config, model, tx)
  step_fn = make_train_step(config, sde, model, tx)
  mesh = make_mesh()  # all global devices on the 'data' axis
  rs = replicated_sharding(mesh)
  bs = batch_sharding(mesh)
  jitted = jax.jit(step_fn, in_shardings=(rs, bs, rs),
                   out_shardings=(rs, rs))
  return state, jitted, rs, bs


def _global_batch(config, bs, seed):
  import jax
  import numpy as np
  num_procs = jax.process_count()
  per_host = config.training.batch_size // num_procs
  rng = np.random.default_rng(seed + jax.process_index())
  local = rng.uniform(-1.0, 1.0,
                      (per_host, config.data.image_size,
                       config.data.image_size, 3)).astype(np.float32)
  return jax.make_array_from_process_local_data(
      bs, local, (config.training.batch_size, config.data.image_size,
                  config.data.image_size, 3))


def _param_checksum(params) -> float:
  import jax
  import numpy as np
  return float(sum(np.float64(np.sum(np.abs(np.asarray(p))))
                   for p in jax.tree.leaves(params)))


def phase_data(outdir, proc_id, num_procs):
  import os
  import jax
  import numpy as np
  from soft_truncation_tpu.data import datasets as D

  config = _build()

  # --- per-host input sharding: each host must see a disjoint slice and a
  # per-host batch of global_batch / process_count
  train_ds, _ = D.get_dataset(config)
  it = iter(train_ds.as_numpy_iterator())
  batch, it = D.get_batch(config, it, train_ds)
  per_host = config.training.batch_size // num_procs
  assert batch.shape[0] == per_host, batch.shape

  # fingerprint which source images this host saw over ~2 epochs, to prove
  # disjointness across hosts (synthetic data is deterministic per split)
  seen = set()
  for _ in range(16):
    b, it = D.get_batch(config, it, train_ds)
    for img in np.asarray(b):
      seen.add(hash(np.ascontiguousarray(
          (img * 255).astype(np.uint8)).tobytes()))
  with open(os.path.join(outdir, f"fingerprint_{proc_id}.txt"), "w") as f:
    f.write("\n".join(str(h) for h in sorted(seen)))

  # --- one data-parallel train step over the GLOBAL mesh
  state, jitted, rs, bs = _setup_step(config)
  global_batch = jax.make_array_from_process_local_data(
      bs, np.asarray(batch, np.float32) * 2.0 - 1.0,
      (config.training.batch_size,) + batch.shape[1:])
  state = jax.device_put(state, rs)
  state, losses = jitted(state, global_batch, jax.random.PRNGKey(1))
  losses = np.asarray(jax.device_get(losses))
  assert losses.shape == (config.training.batch_size,), losses.shape
  assert np.all(np.isfinite(losses)), losses
  assert int(state.step) == 1
  print(f"proc {proc_id}: global step ok, loss mean {losses.mean():.4f}")


def phase_ckpt_save(outdir, proc_id, num_procs):
  import os
  import jax
  import numpy as np
  from soft_truncation_tpu.train import CheckpointManager

  config = _build()
  state, jitted, rs, bs = _setup_step(config)
  state = jax.device_put(state, rs)
  state, losses = jitted(state, _global_batch(config, bs, seed=10),
                         jax.random.PRNGKey(1))
  assert np.all(np.isfinite(np.asarray(jax.device_get(losses))))
  assert int(state.step) == 1

  # every process calls save_meta with its (replicated) device state —
  # the manager's barriers serialize the tmp-write/rename on process 0
  mgr = CheckpointManager(os.path.join(outdir, "workdir"))
  host_state = jax.device_get(state)
  mgr.save_meta(host_state)
  with open(os.path.join(outdir, f"saved_checksum_{proc_id}.txt"),
            "w") as f:
    f.write(repr(_param_checksum(host_state.params)))
  print(f"proc {proc_id}: ckpt save ok, step {int(state.step)}")


def phase_ckpt_resume(outdir, proc_id, num_procs):
  import os
  import jax
  import numpy as np
  from soft_truncation_tpu.train import CheckpointManager

  config = _build()
  state, jitted, rs, bs = _setup_step(config)

  mgr = CheckpointManager(os.path.join(outdir, "workdir"))
  restored = mgr.restore_meta(state)
  assert restored is not None, "no checkpoint found on resume"
  assert int(restored.step) == 1, int(restored.step)
  with open(os.path.join(outdir, f"saved_checksum_{proc_id}.txt")) as f:
    saved = float(f.read())
  got = _param_checksum(restored.params)
  assert abs(got - saved) <= 1e-6 * max(1.0, abs(saved)), (got, saved)

  # continue stepping over the global mesh from the restored state
  state = jax.device_put(restored, rs)
  state, losses = jitted(state, _global_batch(config, bs, seed=20),
                         jax.random.PRNGKey(2))
  losses = np.asarray(jax.device_get(losses))
  assert np.all(np.isfinite(losses)), losses
  assert int(state.step) == 2, int(state.step)
  print(f"proc {proc_id}: ckpt resume ok, step {int(state.step)}, "
        f"loss mean {losses.mean():.4f}")


def main():
  coord, num_procs, proc_id, outdir = (sys.argv[1], int(sys.argv[2]),
                                       int(sys.argv[3]), sys.argv[4])
  phase = sys.argv[5] if len(sys.argv) > 5 else "data"
  import jax
  jax.config.update("jax_platforms", "cpu")
  jax.config.update("jax_num_cpu_devices", 2)  # 2 "chips" per "host"
  jax.config.update("jax_threefry_partitionable", True)
  jax.distributed.initialize(coordinator_address=coord,
                             num_processes=num_procs, process_id=proc_id)
  assert jax.process_count() == num_procs, jax.process_count()
  assert len(jax.devices()) == 2 * num_procs, len(jax.devices())

  {"data": phase_data,
   "ckpt_save": phase_ckpt_save,
   "ckpt_resume": phase_ckpt_resume}[phase](outdir, proc_id, num_procs)
  jax.distributed.shutdown()


if __name__ == "__main__":
  main()
