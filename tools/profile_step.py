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
  totals, counts = {}, {}
  wall = 0.0
  for e in events:
    if e.get("ph") != "X" or e.get("pid") not in device_pids:
      continue
    name = e.get("name", "?")
    dur = float(e.get("dur", 0.0))  # microseconds
    totals[name] = totals.get(name, 0.0) + dur
    counts[name] = counts.get(name, 0) + 1
    wall += dur
  ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
  return [{"name": n, "total_us": round(d, 1), "calls": counts[n],
           "frac": round(d / wall, 4)} for n, d in ranked], wall


def main():
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

  ranked, device_us = aggregate_trace(trace_dir)
  print(json.dumps({
      "batch": batch, "steps": 10,
      "wall_s": round(dt, 3),
      "imgs_per_sec": round(batch * 10 / dt, 1),
      "device_time_accounted_us": round(device_us, 0),
      "top_ops": ranked,
  }, indent=1))


if __name__ == "__main__":
  main()
