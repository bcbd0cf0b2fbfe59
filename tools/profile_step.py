"""Capture a device trace of the bench train step and print the top
kernels by device time — the measurement VERDICT round-1 item 2 asks the
perf work to be driven by.

Runs the same configuration as bench.py (flagship DDPM++ VP NLL+ST,
bf16 compute+norms, fast PRNG), traces a handful of steps with
jax.profiler, then parses the Perfetto/Chrome trace it wrote and
aggregates wall time per XLA op category and per fusion name.

Usage: python tools/profile_step.py [batch] [--pallas-fir]
Writes the raw trace under /tmp/st_profile/ and prints a JSON summary.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from soft_truncation_tpu.utils.compile_cache import (
    setup_compilation_cache_from_argv)
COMPILE_CACHE = setup_compilation_cache_from_argv()


def build_step(batch_size: int):
  from soft_truncation_tpu.losses import get_optimizer
  from soft_truncation_tpu.models import create_model
  from soft_truncation_tpu.parallel import (batch_sharding, make_mesh,
                                            replicated_sharding)
  from soft_truncation_tpu.sde import get_sde
  from soft_truncation_tpu.train import init_train_state, make_train_step
  from __graft_entry__ import _flagship_config

  config = _flagship_config()
  config.training.batch_size = batch_size
  config.tpu.compute_dtype = "bfloat16"
  config.tpu.norm_dtype = "bfloat16"
  jax.config.update("jax_default_prng_impl", "unsafe_rbg")

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
  batch = jax.device_put(
      jax.random.uniform(jax.random.PRNGKey(1),
                         (batch_size, 32, 32, 3)) * 2 - 1, bs)
  state = jax.device_put(state, rs)
  return jitted, state, batch


def aggregate_trace(trace_dir: str, top: int = 25):
  """Sum device-lane event durations by event name from the trace."""
  files = glob.glob(os.path.join(
      trace_dir, "plugins", "profile", "*", "*.trace.json.gz"))
  assert files, f"no trace found under {trace_dir}"
  with gzip.open(sorted(files)[-1], "rt") as f:
    trace = json.load(f)
  events = trace.get("traceEvents", [])
  # device lanes: pid whose process_name metadata mentions the TPU/device
  device_pids = set()
  for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
      name = str(e.get("args", {}).get("name", "")).lower()
      if "tpu" in name or "device" in name or "/device" in name:
        device_pids.add(e["pid"])
  totals, counts, cats = {}, {}, {}
  wall = 0.0
  for e in events:
    if e.get("ph") != "X" or e.get("pid") not in device_pids:
      continue
    name = e.get("name", "?")
    # real kernel events carry an hlo_category arg; envelope lanes
    # (jit_*, while bodies, per-step frames) don't and would double-count
    cat = (e.get("args", {}) or {}).get("hlo_category")
    if not cat or cat == "while":  # 'while' = scan envelope, double-counts
      continue
    dur = float(e.get("dur", 0.0))  # microseconds
    totals[name] = totals.get(name, 0.0) + dur
    counts[name] = counts.get(name, 0) + 1
    # trust the compiler's own category, not the kernel name: e.g. XLA
    # names conv+GN-stats+convert fusions 'convert_reduce_fusion' even
    # though their hlo_category is 'convolution fusion'
    cats[cat] = cats.get(cat, 0.0) + dur
    wall += dur
  ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
  by_cat = {k: round(v / wall, 4)
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1])}
  return ([{"name": n, "total_us": round(d, 1), "calls": counts[n],
            "frac": round(d / wall, 4)} for n, d in ranked], wall, by_cat)


def build_sampler(batch_size: int, n_scales: int = 100):
  """PC sampler (UNCSN++ VE), one scan of n_scales steps — the
  per-model-eval profile is N-independent, so a short N keeps the
  trace small."""
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      "c", "soft_truncation_tpu/configs/ve/CIFAR10/uncsnpp_st.py")
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  config = mod.get_config()
  config.sampling.batch_size = batch_size
  config.model.num_scales = n_scales
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
  shape = (batch_size, 32, 32, 3)
  sampler = jax.jit(
      get_sampling_fn(config, sde, shape, get_data_inverse_scaler(config),
                      config.sampling.truncation_time),
      static_argnums=0)
  return sampler, model, state.params, n_scales


def main_sample():
  args = [a for a in sys.argv[1:] if not a.startswith("--")]
  batch = int(args[0]) if args else 64
  sampler, model, params, n_scales = build_sampler(batch)
  samples, nfe = sampler(model, params, jax.random.PRNGKey(1))  # compile
  float(samples.mean())

  trace_dir = "/tmp/st_profile_sample"
  jax.profiler.start_trace(trace_dir)
  t0 = time.perf_counter()
  samples, nfe = sampler(model, params, jax.random.PRNGKey(2))
  float(samples.mean())
  dt = time.perf_counter() - t0
  jax.profiler.stop_trace()

  ranked, device_us, by_cat = aggregate_trace(trace_dir)
  print(json.dumps({
      "mode": "pc_sample", "batch": batch, "nfe": int(nfe),
      "wall_s": round(dt, 3),
      "ms_per_eval": round(dt / int(nfe) * 1000, 3),
      "device_time_accounted_us": round(device_us, 0),
      "by_hlo_category": by_cat,
      "top_ops": ranked[:10],
  }, indent=1))


def main():
  if "--sample" in sys.argv:
    main_sample()
    return
  args = [a for a in sys.argv[1:] if not a.startswith("--")]
  batch = int(args[0]) if args else 128
  if "--pallas-fir" in sys.argv:
    os.environ["SOFT_TRUNCATION_PALLAS_FIR"] = "1"
  jitted, state, batch_arr = build_step(batch)

  key = jax.random.PRNGKey(2)
  for _ in range(3):  # compile + warm
    key, k = jax.random.split(key)
    state, losses = jitted(state, batch_arr, k)
  float(losses.mean())

  trace_dir = "/tmp/st_profile"
  jax.profiler.start_trace(trace_dir)
  t0 = time.perf_counter()
  for _ in range(10):
    key, k = jax.random.split(key)
    state, losses = jitted(state, batch_arr, k)
  float(losses.mean())
  dt = time.perf_counter() - t0
  jax.profiler.stop_trace()

  ranked, device_us, by_cat = aggregate_trace(trace_dir)
  print(json.dumps({
      "batch": batch, "steps": 10,
      "wall_s": round(dt, 3),
      "imgs_per_sec": round(batch * 10 / dt, 1),
      "device_time_accounted_us": round(device_us, 0),
      "by_hlo_category": by_cat,
      "top_ops": ranked[:10],
  }, indent=1))


if __name__ == "__main__":
  main()
