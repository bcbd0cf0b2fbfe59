"""Trained-score adaptive-ODE NFE measurement (round-2 review item 8).

The random-weights ODE bench (tools/bench_sampling.py --ode) reports an
unrealistically low NFE (init_scale=0 => score ~ 0 => trivially smooth
flow); the FID-50k projection previously leaned on an analytic-probe ×
"2-3x" rule of thumb. This tool loads a REAL trained checkpoint from a
workdir (EMA params) and measures the adaptive dopri5 NFE at the
reference tolerances (rtol=atol=1e-5), replacing the guess with a
measurement.

Usage:
  python tools/measure_ode_nfe.py <workdir> [batch] [--bf16-norms]
Appends a record (trained_score=true) to benchmarks/sampling.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from soft_truncation_tpu.utils.compile_cache import (
    setup_compilation_cache_from_argv)
COMPILE_CACHE = setup_compilation_cache_from_argv()


def main():
  args = [a for a in sys.argv[1:] if not a.startswith("--")]
  workdir = args[0]
  batch = int(args[1]) if len(args) > 1 else 64
  bf16_norms = "--bf16-norms" in sys.argv

  import importlib.util
  spec = importlib.util.spec_from_file_location(
      "c", "soft_truncation_tpu/configs/ve/CIFAR10/uncsnpp_st.py")
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  config = mod.get_config()
  config.sampling.batch_size = batch
  config.sampling.method = "ode"
  config.tpu.compute_dtype = "bfloat16"
  if bf16_norms:
    config.tpu.norm_dtype = "bfloat16"
  jax.config.update("jax_default_prng_impl", "unsafe_rbg")

  from soft_truncation_tpu.data import get_data_inverse_scaler
  from soft_truncation_tpu.losses import get_optimizer
  from soft_truncation_tpu.models import create_model
  from soft_truncation_tpu.sample import get_sampling_fn
  from soft_truncation_tpu.sde import get_sde
  from soft_truncation_tpu.train import CheckpointManager, init_train_state

  sde = get_sde(config)
  model = create_model(config)
  state = init_train_state(jax.random.PRNGKey(0), config, model,
                           get_optimizer(config))
  ckpt = CheckpointManager(workdir)
  restored = ckpt.restore_meta(state)
  assert restored is not None, f"no checkpoint under {workdir}"
  # eval uses EMA (reference run_lib.py:140); restore lands on host —
  # upload once
  params = jax.device_put(restored.ema_params)
  trained_steps = int(restored.step)
  print(f"loaded checkpoint at step {trained_steps}")

  shape = (batch, 32, 32, 3)
  sampler = jax.jit(
      get_sampling_fn(config, sde, shape, get_data_inverse_scaler(config),
                      config.sampling.truncation_time),
      static_argnums=0)

  t0 = time.perf_counter()
  samples, nfe = sampler(model, params, jax.random.PRNGKey(1))
  float(samples.mean())
  compile_s = time.perf_counter() - t0

  # pair each run's wall time with ITS OWN nfe — adaptive dopri5 NFE varies
  # per key, and mean(dt)/max(nfe) would understate ms_per_nfe whenever the
  # runs disagree
  nfes, dts = [], []
  for i in range(3):
    t0 = time.perf_counter()
    samples, nfe = sampler(model, params, jax.random.PRNGKey(2 + i))
    float(samples.mean())
    dts.append(time.perf_counter() - t0)
    nfes.append(int(nfe))
  dt = sum(dts) / len(dts)
  nfe = max(nfes)
  ms_per_nfe = sum(d / n for d, n in zip(dts, nfes)) / len(dts) * 1000

  rec = {
      "config": "ve/CIFAR10/uncsnpp_st", "sampler": "ode",
      "trained_score": True, "trained_steps": trained_steps,
      "rtol": 1e-5, "atol": 1e-5,
      "nfe": nfe, "nfe_runs": nfes, "batch": batch,
      "compute_dtype": "bfloat16",
      "norm_dtype": "bfloat16" if bf16_norms else "float32",
      "compile_cache": "on" if COMPILE_CACHE else "off",
      "compile_s": round(compile_s, 1),
      "batch_s": round(dt, 2),
      "ms_per_nfe": round(ms_per_nfe, 3),
      "imgs_per_sec": round(batch / dt, 2),
      "fid50k_min_per_chip": round(dt * (50000 / batch) / 60, 1),
      "device": str(jax.devices()[0]),
  }
  print(json.dumps(rec))
  out = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), "benchmarks", "sampling.jsonl")
  with open(out, "a") as f:
    f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
  main()
