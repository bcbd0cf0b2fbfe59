"""Sampling throughput benchmark: PC sampler (UNCSN++ config, N=1000,
langevin corrector => 2000 NFE/sample-batch) on the real TPU.

Projects FID-50k sampling wall-clock (BASELINE.md metric). Run standalone:
  python tools/bench_sampling.py [batch ...]      # default sweep 256 512 1024
Appends one JSON record per batch size to benchmarks/sampling.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from soft_truncation_tpu.utils.compile_cache import setup_compilation_cache
setup_compilation_cache()


def run_one(batch: int) -> dict:
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      "c", "soft_truncation_tpu/configs/ve/CIFAR10/uncsnpp_st.py")
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  config = mod.get_config()
  config.sampling.batch_size = batch
  config.tpu.compute_dtype = "bfloat16"
  jax.config.update("jax_default_prng_impl", "unsafe_rbg")

  from soft_truncation_tpu.data import get_data_inverse_scaler
  from soft_truncation_tpu.models import create_model
  from soft_truncation_tpu.sample import get_sampling_fn
  from soft_truncation_tpu.sde import get_sde
  from soft_truncation_tpu.train import init_train_state
  from soft_truncation_tpu.losses import get_optimizer

  sde = get_sde(config)
  model = create_model(config)
  state = init_train_state(jax.random.PRNGKey(0), config, model,
                           get_optimizer(config))
  shape = (batch, 32, 32, 3)
  # chunked dispatches: one full-N scan at batch>=256 runs 30s+ per device
  # call, which trips the remote-runtime watchdog (observed worker crash);
  # chunk=100 keeps each dispatch ~2-4s, results bit-identical
  config.sampling.chunk = 100
  sampler = get_sampling_fn(config, sde, shape,
                            get_data_inverse_scaler(config),
                            config.sampling.truncation_time)
  if not getattr(sampler, "self_jitting", False):
    sampler = jax.jit(sampler, static_argnums=0)

  # roofline probe: XLA cost model of a short single-scan sampler gives
  # per-model-eval FLOPs/bytes (scales linearly in N; N=10 compiles fast)
  probe_cfg = mod.get_config()
  probe_cfg.sampling.batch_size = batch
  probe_cfg.tpu.compute_dtype = "bfloat16"
  probe_cfg.model.num_scales = 10
  probe_sde = get_sde(probe_cfg)
  probe = get_sampling_fn(probe_cfg, probe_sde, shape,
                          get_data_inverse_scaler(probe_cfg),
                          probe_cfg.sampling.truncation_time)
  lowered = jax.jit(probe, static_argnums=0).lower(
      model, state.params, jax.random.PRNGKey(0))
  ca = lowered.compile().cost_analysis() or {}
  # XLA's cost model counts a scan body ONCE regardless of trip count
  # (verified: flops(N=10) == flops(N=20)), so the compiled program holds
  # scan-body (corrector+predictor = 2 evals) + final denoise (1 eval)
  probe_evals = 3
  flops_per_eval = float(ca.get("flops", 0.0)) / probe_evals
  bytes_per_eval = float(ca.get("bytes accessed", 0.0)) / probe_evals

  t0 = time.perf_counter()
  samples, nfe = sampler(model, state.params, jax.random.PRNGKey(1))
  float(samples.mean())
  compile_time = time.perf_counter() - t0

  t0 = time.perf_counter()
  samples, nfe = sampler(model, state.params, jax.random.PRNGKey(2))
  float(samples.mean())
  dt = time.perf_counter() - t0

  per_50k = dt * (50000 / batch)
  rec = {
      "config": "ve/CIFAR10/uncsnpp_st", "sampler": "pc",
      "N": int(sde.N), "nfe": int(nfe), "batch": batch,
      "compute_dtype": "bfloat16",
      "compile_s": round(compile_time, 1),
      "batch_s": round(dt, 2),
      "ms_per_nfe": round(dt / int(nfe) * 1000, 3),
      "imgs_per_sec": round(batch / dt, 2),
      "fid50k_min_per_chip": round(per_50k / 60, 1),
      "flops_per_eval": flops_per_eval,
      "hbm_bytes_per_eval": bytes_per_eval,
      # vs v5e peaks (197 TF/s bf16, 819 GB/s)
      "eval_mfu": round(flops_per_eval / (dt / int(nfe)) / 197e12, 4),
      "eval_hbm_frac": round(bytes_per_eval / (dt / int(nfe)) / 819e9, 4),
      "device": str(jax.devices()[0]),
  }
  print(json.dumps(rec))
  return rec


def run_one_ode(batch: int) -> dict:
  """ODE (probability-flow) sampler: on-device adaptive dopri5 at the
  reference's default tolerances (rtol=atol=1e-5, sampling.py:436-504).

  The reference offers the same sampler (sampling.method='ode') but
  integrates with scipy on the host — hundreds of host<->device round
  trips per batch. Fully on-device, the adaptive solver needs ~10x fewer
  NFE than PC-2000 for the same config, which is the big FID-50k
  wall-clock lever.
  """
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      "c", "soft_truncation_tpu/configs/ve/CIFAR10/uncsnpp_st.py")
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  config = mod.get_config()
  config.sampling.batch_size = batch
  config.sampling.method = "ode"
  config.tpu.compute_dtype = "bfloat16"
  jax.config.update("jax_default_prng_impl", "unsafe_rbg")

  from soft_truncation_tpu.data import get_data_inverse_scaler
  from soft_truncation_tpu.models import create_model
  from soft_truncation_tpu.sample import get_sampling_fn
  from soft_truncation_tpu.sde import get_sde
  from soft_truncation_tpu.train import init_train_state
  from soft_truncation_tpu.losses import get_optimizer

  sde = get_sde(config)
  model = create_model(config)
  state = init_train_state(jax.random.PRNGKey(0), config, model,
                           get_optimizer(config))
  shape = (batch, 32, 32, 3)
  sampler = jax.jit(
      get_sampling_fn(config, sde, shape, get_data_inverse_scaler(config),
                      config.sampling.truncation_time),
      static_argnums=0)

  t0 = time.perf_counter()
  samples, nfe = sampler(model, state.params, jax.random.PRNGKey(1))
  float(samples.mean())
  compile_time = time.perf_counter() - t0

  t0 = time.perf_counter()
  samples, nfe = sampler(model, state.params, jax.random.PRNGKey(2))
  float(samples.mean())
  dt = time.perf_counter() - t0
  nfe = int(nfe)

  rec = {
      "config": "ve/CIFAR10/uncsnpp_st", "sampler": "ode",
      # CAVEAT: with the zero-initialized bench network (init_scale=0 =>
      # score ~ 0) the flow is trivially smooth and nfe is unrealistically
      # low. ms_per_nfe is the honest per-eval cost; project wall-clock
      # with a trained-score NFE (~2-3x the 98-NFE analytic-field probe,
      # see benchmarks/ROOFLINE.md).
      "rtol": 1e-5, "atol": 1e-5, "nfe": nfe, "batch": batch,
      "compute_dtype": "bfloat16",
      "compile_s": round(compile_time, 1),
      "batch_s": round(dt, 2),
      "ms_per_nfe": round(dt / nfe * 1000, 3),
      "imgs_per_sec": round(batch / dt, 2),
      "fid50k_min_per_chip": round(dt * (50000 / batch) / 60, 1),
      "device": str(jax.devices()[0]),
  }
  print(json.dumps(rec))
  return rec


def run_one_dpm(batch: int, steps: int = 50) -> dict:
  """DPM-Solver++(2M) (beyond-parity fast sampler): fixed NFE = steps+1,
  one score eval per step, so the random-weights timing IS the production
  cost (unlike the adaptive ODE path)."""
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      "c", "soft_truncation_tpu/configs/ve/CIFAR10/uncsnpp_st.py")
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  config = mod.get_config()
  config.sampling.batch_size = batch
  config.sampling.method = "dpm_solver"
  config.sampling.dpm_steps = steps
  config.tpu.compute_dtype = "bfloat16"
  jax.config.update("jax_default_prng_impl", "unsafe_rbg")

  from soft_truncation_tpu.data import get_data_inverse_scaler
  from soft_truncation_tpu.models import create_model
  from soft_truncation_tpu.sample import get_sampling_fn
  from soft_truncation_tpu.sde import get_sde
  from soft_truncation_tpu.train import init_train_state
  from soft_truncation_tpu.losses import get_optimizer

  sde = get_sde(config)
  model = create_model(config)
  state = init_train_state(jax.random.PRNGKey(0), config, model,
                           get_optimizer(config))
  shape = (batch, 32, 32, 3)
  sampler = jax.jit(
      get_sampling_fn(config, sde, shape, get_data_inverse_scaler(config),
                      config.sampling.truncation_time),
      static_argnums=0)

  t0 = time.perf_counter()
  samples, nfe = sampler(model, state.params, jax.random.PRNGKey(1))
  float(samples.mean())
  compile_time = time.perf_counter() - t0

  t0 = time.perf_counter()
  samples, nfe = sampler(model, state.params, jax.random.PRNGKey(2))
  float(samples.mean())
  dt = time.perf_counter() - t0
  nfe = int(nfe)

  rec = {
      "config": "ve/CIFAR10/uncsnpp_st", "sampler": "dpm_solver",
      "steps": steps, "nfe": nfe, "batch": batch,
      "compute_dtype": "bfloat16",
      "compile_s": round(compile_time, 1),
      "batch_s": round(dt, 2),
      "ms_per_nfe": round(dt / nfe * 1000, 3),
      "imgs_per_sec": round(batch / dt, 2),
      "fid50k_min_per_chip": round(dt * (50000 / batch) / 60, 1),
      "device": str(jax.devices()[0]),
  }
  print(json.dumps(rec))
  return rec


def main():
  args = sys.argv[1:]
  ode = "--ode" in args
  dpm = "--dpm" in args
  args = [a for a in args if not a.startswith("--")]
  batches = [int(a) for a in args] if args else (
      [64, 128, 256] if (ode or dpm) else [256, 512, 1024])
  fn = run_one_dpm if dpm else (run_one_ode if ode else run_one)
  recs = [fn(b) for b in batches]
  out = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), "benchmarks", "sampling.jsonl")
  os.makedirs(os.path.dirname(out), exist_ok=True)
  with open(out, "a") as f:
    for rec in recs:
      f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
  main()
