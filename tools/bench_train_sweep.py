"""Train-step throughput sweep on the real TPU: batch size x remat policy
x pallas-FIR, with XLA cost-model FLOPs/bytes per point — the experiment
grid behind benchmarks/ROOFLINE.md.

Each point runs the same flagship step as bench.py (DDPM++ VP NLL+ST,
bf16 compute+norms, fast PRNG) and appends one JSON record to
benchmarks/train_sweep.jsonl.

Usage:
  python tools/bench_train_sweep.py batch=128 remat=none
  python tools/bench_train_sweep.py batch=256 remat=conv_outputs
  python tools/bench_train_sweep.py batch=128 remat=full fir=1 config=uncsnpp
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from soft_truncation_tpu.utils.compile_cache import (
    setup_compilation_cache_from_argv)
COMPILE_CACHE = setup_compilation_cache_from_argv()

V5E_PEAK_FLOPS = 197e12  # bf16
V5E_PEAK_HBM = 819e9


def run_one(batch: int, remat: str, fir: bool, config_name: str,
            state_dtype: str = "f32", rng: str = "unsafe_rbg",
            dropout_bits: int = 32, act: str = "") -> dict:
  if fir:
    os.environ["SOFT_TRUNCATION_PALLAS_FIR"] = "1"
  from soft_truncation_tpu.losses import get_optimizer
  from soft_truncation_tpu.models import create_model
  from soft_truncation_tpu.parallel import (batch_sharding, make_mesh,
                                            replicated_sharding)
  from soft_truncation_tpu.sde import get_sde
  from soft_truncation_tpu.train import init_train_state, make_train_step
  from __graft_entry__ import _flagship_config

  if config_name == "flagship":
    config = _flagship_config()
  else:
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "c", "soft_truncation_tpu/configs/ve/CIFAR10/uncsnpp_st.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    config = mod.get_config()
  config.training.batch_size = batch
  config.optim.num_micro_batch = 1
  config.tpu.compute_dtype = "bfloat16"
  config.tpu.norm_dtype = "bfloat16"
  if remat == "none":
    config.tpu.remat = False
  else:
    config.tpu.remat = True
    config.tpu.remat_policy = remat
  if state_dtype == "bf16":
    # optimizer/EMA byte diet: bf16 EMA shadow + bf16 Adam first moment
    config.tpu.ema_dtype = "bfloat16"
    config.tpu.adam_mu_dtype = "bfloat16"
  elif state_dtype == "bf16_mu":
    # the numerically-safe subset (bf16 EMA fails parity — test_byte_diet)
    config.tpu.adam_mu_dtype = "bfloat16"
  # rng=threefry2x32 measures the bit-reproducible path (the CLI default);
  # dropout_bits=16/8 packs mask lanes (models/dropout.py) to attack the
  # measured ~25% threefry dropout tax
  config.tpu.dropout_bits = dropout_bits
  # act=float8_e4m3: conv-input activations stored in HBM as e4m3 with
  # e5m2 cotangent round-trips (ops/quant.py) — the fp8 byte-diet arm
  if act:
    config.tpu.activation_dtype = act
  jax.config.update("jax_default_prng_impl", rng)
  if rng == "threefry2x32":
    jax.config.update("jax_threefry_partitionable", True)

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
      jax.random.uniform(jax.random.PRNGKey(1), (batch, size, size, 3))
      * 2 - 1, bs)
  state = jax.device_put(state, rs)

  compiled = jitted.lower(state, batch_arr, jax.random.PRNGKey(2)).compile()
  ca = compiled.cost_analysis() or {}
  flops = float(ca.get("flops", 0.0))
  nbytes = float(ca.get("bytes accessed", 0.0))

  key = jax.random.PRNGKey(2)
  for _ in range(3):
    key, k = jax.random.split(key)
    state, losses = jitted(state, batch_arr, k)
  float(losses.mean())
  iters = 20
  t0 = time.perf_counter()
  for _ in range(iters):
    key, k = jax.random.split(key)
    state, losses = jitted(state, batch_arr, k)
  float(losses.mean())
  dt = time.perf_counter() - t0

  step_s = dt / iters
  rec = {
      "config": config_name, "batch": batch, "remat": remat,
      "state_dtype": state_dtype, "rng_impl": rng,
      "dropout_bits": dropout_bits,
      "activation_dtype": act or "bfloat16",
      "pallas_fir": fir,
      "step_ms": round(step_s * 1000, 2),
      "imgs_per_sec": round(batch * iters / dt, 1),
      "mfu": round(flops / step_s / V5E_PEAK_FLOPS, 4),
      "hbm_frac": round(nbytes / step_s / V5E_PEAK_HBM, 4),
      "compile_cache": "on" if COMPILE_CACHE else "off",
      "flops_per_step": flops,
      "hbm_bytes_per_step": nbytes,
      "device": str(jax.devices()[0]),
  }
  print(json.dumps(rec), flush=True)
  return rec


def main():
  kv = dict(a.split("=", 1) for a in sys.argv[1:]
            if not a.startswith("--"))
  rec = run_one(int(kv.get("batch", 128)), kv.get("remat", "none"),
                kv.get("fir", "0") == "1", kv.get("config", "flagship"),
                kv.get("state_dtype", "f32"),
                kv.get("rng", "unsafe_rbg"),
                int(kv.get("dropout_bits", 32)),
                kv.get("act", ""))
  out = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), "benchmarks", "train_sweep.jsonl")
  os.makedirs(os.path.dirname(out), exist_ok=True)
  with open(out, "a") as f:
    f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
  main()
