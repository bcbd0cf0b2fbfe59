"""Exact-NLL cost A/B on the real TPU: shared-primal jvp x norm dtype.

The round-3 production run measured the exact probability-flow NLL at
19.9 ms/NFE vs the ODE sampler's 8.9 (benchmarks/likelihood.jsonl) — the
gap is the Hutchinson divergence pass. Two levers, both implemented:

  * shared_primal (likelihood/likelihood.py): ``jax.jvp`` returns the
    drift as its primal, so each RK stage evaluates the network once
    instead of twice (XLA does not CSE across separate applications).
  * norm_dtype=bfloat16: GroupNorm statistics in bf16 — measured -9% on
    PC sampling (forward-only pays no backward penalty); the NLL pass is
    forward-only too.

Runs all four arms in ONE process (same-session A/B per the ROOFLINE
rule), batch 64, bf16 compute, unsafe_rbg, random-init params (ms/NFE is
a per-evaluation cost, independent of the score field the solver
follows; the absolute NFE at random init is NOT representative — see the
trained-score likelihood.jsonl row for that). Appends one JSON record
per arm to benchmarks/likelihood.jsonl.

Usage: python tools/bench_likelihood.py [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from soft_truncation_tpu.utils.compile_cache import (
    setup_compilation_cache_from_argv)
COMPILE_CACHE = setup_compilation_cache_from_argv()

CONFIG_PATH = "soft_truncation_tpu/configs/ve/CIFAR10/uncsnpp_st.py"
STEADY_REPS = 3


def _load_config(norm_dtype: str):
  import importlib.util
  spec = importlib.util.spec_from_file_location("c", CONFIG_PATH)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  config = mod.get_config()
  config.tpu.compute_dtype = "bfloat16"
  config.tpu.norm_dtype = norm_dtype
  jax.config.update("jax_default_prng_impl", "unsafe_rbg")
  return config


def run_arm(batch: int, shared_primal: bool, norm_dtype: str,
            params_cache: dict) -> dict:
  from soft_truncation_tpu.data import get_data_inverse_scaler
  from soft_truncation_tpu.likelihood import get_likelihood_fn
  from soft_truncation_tpu.losses import get_optimizer
  from soft_truncation_tpu.models import create_model
  from soft_truncation_tpu.sde import get_sde
  from soft_truncation_tpu.train import init_train_state

  config = _load_config(norm_dtype)
  sde = get_sde(config)
  model = create_model(config)
  # one init shared across arms: norm_dtype/shared_primal do not change
  # the param tree, and identical params make the arms' bpds comparable
  if "params" not in params_cache:
    state = init_train_state(jax.random.PRNGKey(0), config, model,
                             get_optimizer(config))
    params_cache["params"] = state.params
  params = params_cache["params"]

  likelihood_fn = get_likelihood_fn(
      config, sde, get_data_inverse_scaler(config),
      shared_primal=shared_primal)
  jitted = jax.jit(
      lambda p, d, k: likelihood_fn(model, p, d, k),
      donate_argnums=())

  size = config.data.image_size
  data = jax.random.uniform(jax.random.PRNGKey(1),
                            (batch, size, size, 3))  # [0,1], centered=False

  t0 = time.perf_counter()
  bpd, _, nfe = jitted(params, data, jax.random.PRNGKey(2))
  bpd0 = float(bpd.mean())
  compile_s = time.perf_counter() - t0

  t0 = time.perf_counter()
  total_nfe = 0
  for i in range(STEADY_REPS):
    bpd, _, nfe = jitted(params, data, jax.random.PRNGKey(3 + i))
    bpd_last = float(bpd.mean())
    total_nfe += int(nfe)
  dt = time.perf_counter() - t0

  rec = {
      "benchmark": "exact_nll_ab",
      "config": "ve/CIFAR10/uncsnpp_st",
      "batch": batch,
      "compute_dtype": "bfloat16",
      "norm_dtype": norm_dtype,
      "shared_primal": shared_primal,
      "rng_impl": "unsafe_rbg",
      "params": "random-init (per-NFE cost is field-independent)",
      "compile_cache": "on" if COMPILE_CACHE else "off",
      "compile_plus_first_s": round(compile_s, 1),
      "steady_reps": STEADY_REPS,
      "steady_s_per_batch": round(dt / STEADY_REPS, 3),
      "nfe_total": total_nfe,
      "ms_per_nfe": round(dt / total_nfe * 1000, 3),
      "imgs_per_sec": round(batch * STEADY_REPS / dt, 2),
      "bpd_first": round(bpd0, 5),
      "bpd_last": round(bpd_last, 5),
      "device": str(jax.devices()[0]),
  }
  print(json.dumps(rec), flush=True)
  return rec


def main():
  batch = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
      else 64
  params_cache = {}
  out = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), "benchmarks", "likelihood.jsonl")
  arms = [
      (False, "float32"),   # the r3 production form (19.9 ms/NFE row)
      (True, "float32"),    # shared primal only
      (False, "bfloat16"),  # bf16 norms only
      (True, "bfloat16"),   # both
  ]
  with open(out, "a") as f:
    for shared, norm in arms:
      rec = run_arm(batch, shared, norm, params_cache)
      f.write(json.dumps(rec) + "\n")
      f.flush()


if __name__ == "__main__":
  main()
