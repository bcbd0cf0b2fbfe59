"""High-resolution feasibility smoke (VERDICT round-1 item 7): compile and
run ONE train step of the 256^2 UNCSN++ config (tiny batch) and the
1024^2 FFHQ UNCSN++ config with remat on the real chip; record peak
device memory and step time.

Parity target: reference configs/ve/celebahq_256_uncsn.py and
configs/ve/ffhq_1024_uncsn.py:69-88 (the reference can only run these on
multi-GPU DataParallel; here one v5e chip with bf16 + remat must fit a
small per-chip batch, with the (data, space) GSPMD mesh as the scale-out
path for production batches).

Usage: python tools/bench_highres.py [256|1024] [batch]
Appends a JSON record to benchmarks/highres.jsonl.
"""

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from soft_truncation_tpu.utils.compile_cache import (
    setup_compilation_cache_from_argv)
COMPILE_CACHE = setup_compilation_cache_from_argv()


def run_one(res: int, batch: int) -> dict:
  cfg_path = {
      256: "soft_truncation_tpu/configs/ve/celebahq_256_uncsn.py",
      1024: "soft_truncation_tpu/configs/ve/ffhq_1024_uncsn.py",
  }[res]
  spec = importlib.util.spec_from_file_location("c", cfg_path)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  config = mod.get_config()
  config.training.batch_size = batch
  config.optim.num_micro_batch = 1
  config.tpu.compute_dtype = "bfloat16"
  config.tpu.norm_dtype = "bfloat16"
  config.tpu.remat = True
  jax.config.update("jax_default_prng_impl", "unsafe_rbg")

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
  mesh = make_mesh()
  rs = replicated_sharding(mesh)
  bs = batch_sharding(mesh)
  jitted = jax.jit(step_fn, in_shardings=(rs, bs, rs),
                   out_shardings=(rs, rs), donate_argnums=0)
  size = config.data.image_size
  batch_arr = jax.device_put(
      jax.random.uniform(jax.random.PRNGKey(1), (batch, size, size, 3),
                         jax.numpy.float32) * 2 - 1, bs)
  state = jax.device_put(state, rs)

  t0 = time.perf_counter()
  compiled = jitted.lower(state, batch_arr, jax.random.PRNGKey(2)).compile()
  compile_s = time.perf_counter() - t0
  mem = compiled.memory_analysis()
  peak = getattr(mem, "peak_memory_in_bytes", None) if mem else None
  args_mem = getattr(mem, "argument_size_in_bytes", 0) if mem else 0

  t0 = time.perf_counter()
  state, losses = jitted(state, batch_arr, jax.random.PRNGKey(2))
  first_s = time.perf_counter() - t0
  loss = float(losses.mean())
  t0 = time.perf_counter()
  state, losses = jitted(state, batch_arr, jax.random.PRNGKey(3))
  float(losses.mean())
  step_s = time.perf_counter() - t0

  rec = {
      "config": cfg_path.split("configs/")[-1], "image_size": size,
      "batch": batch, "remat": True, "compute_dtype": "bfloat16",
      "compile_cache": "on" if COMPILE_CACHE else "off",
      "compile_s": round(compile_s, 1),
      "peak_hbm_gb": round(peak / 2**30, 2) if peak else None,
      "args_hbm_gb": round(args_mem / 2**30, 2),
      "first_step_s": round(first_s, 2), "step_s": round(step_s, 2),
      "imgs_per_sec": round(batch / step_s, 2), "loss": round(loss, 3),
      "device": str(jax.devices()[0]),
  }
  print(json.dumps(rec), flush=True)
  return rec


def run_sample(res: int, batch: int, steps: int = 50) -> dict:
  """High-res SAMPLING feasibility + cost: DPM-Solver++(2M) on the 256^2
  (or 1024^2) UNCSN++ config, one chip, bf16. Fixed NFE = steps+1, so
  the random-weights timing is the production cost."""
  cfg_path = {
      256: "soft_truncation_tpu/configs/ve/celebahq_256_uncsn.py",
      1024: "soft_truncation_tpu/configs/ve/ffhq_1024_uncsn.py",
  }[res]
  spec = importlib.util.spec_from_file_location("c", cfg_path)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  config = mod.get_config()
  config.sampling.batch_size = batch
  config.sampling.method = "dpm_solver"
  config.sampling.dpm_steps = steps
  config.tpu.compute_dtype = "bfloat16"
  jax.config.update("jax_default_prng_impl", "unsafe_rbg")

  from soft_truncation_tpu.data import get_data_inverse_scaler
  from soft_truncation_tpu.losses import get_optimizer
  from soft_truncation_tpu.models import create_model
  from soft_truncation_tpu.sample import get_sampling_fn
  from soft_truncation_tpu.sde import get_sde
  from soft_truncation_tpu.train import init_train_state

  sde = get_sde(config)
  model = create_model(config)
  state = init_train_state(jax.random.PRNGKey(0), config, model,
                           get_optimizer(config))
  size = config.data.image_size
  shape = (batch, size, size, 3)
  sampler = jax.jit(
      get_sampling_fn(config, sde, shape, get_data_inverse_scaler(config),
                      config.sampling.truncation_time),
      static_argnums=0)

  t0 = time.perf_counter()
  samples, nfe = sampler(model, state.params, jax.random.PRNGKey(1))
  float(samples.mean())
  compile_s = time.perf_counter() - t0
  t0 = time.perf_counter()
  samples, nfe = sampler(model, state.params, jax.random.PRNGKey(2))
  float(samples.mean())
  dt = time.perf_counter() - t0
  nfe = int(nfe)

  rec = {
      "config": cfg_path.split("configs/")[-1], "mode": "dpm_sample",
      "image_size": size, "batch": batch, "steps": steps, "nfe": nfe,
      "compute_dtype": "bfloat16",
      "compile_cache": "on" if COMPILE_CACHE else "off",
      "compile_s": round(compile_s, 1),
      "batch_s": round(dt, 2), "ms_per_nfe": round(dt / nfe * 1000, 2),
      "imgs_per_sec": round(batch / dt, 3),
      "fid50k_min_per_chip": round(dt * (50000 / batch) / 60, 1),
      "device": str(jax.devices()[0]),
  }
  print(json.dumps(rec), flush=True)
  return rec


def main():
  args = [a for a in sys.argv[1:] if not a.startswith("--")]
  res = int(args[0]) if args else 256
  batch = int(args[1]) if len(args) > 1 else (8 if res == 256 else 1)
  if "--sample" in sys.argv:
    rec = run_sample(res, batch)
  else:
    rec = run_one(res, batch)
  out = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), "benchmarks", "highres.jsonl")
  os.makedirs(os.path.dirname(out), exist_ok=True)
  with open(out, "a") as f:
    f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
  main()
