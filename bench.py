"""Benchmark: CIFAR-10 training throughput (imgs/sec/chip) on the flagship
DDPM++ (VP, NLL+ST) config — the BASELINE.md north-star metric.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against an estimated A100 PyTorch reference throughput
for the same model/batch (see ASSUMED_A100_IMGS_PER_SEC below; the
reference repo publishes no numbers — BASELINE.md). The BASELINE.json
north star asks for >= 3x that estimate on TPU.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp

# Reference throughput estimate for the PyTorch repo on one A100:
# DDPM++ (nf=128, ch_mult 1-2-2-2, 4 resblocks, 32x32, batch 128), fp32
# DataParallel single-GPU — on the order of 10 train steps/sec.
ASSUMED_A100_IMGS_PER_SEC = 1280.0

BATCH = 128
WARMUP = 3
ITERS = 20

# Worst honest path is ~7 min (2-3 min axon device init after a killed TPU
# process + up to 2 min cold compile + ~2 min of steps). A wedged axon
# tunnel, however, blocks device init indefinitely (observed: >15 min, in
# an uninterruptible C call) — emit a diagnosable JSON line and exit
# instead of hanging the driver's round-end bench forever.
# A daemon THREAD (not signal.alarm) is deliberate: the wedge is a
# blocking C call in the MAIN thread, and Python signal handlers only run
# on the main thread between bytecodes — an alarm would never fire. The
# blocking PJRT/tunnel RPCs release the GIL while they wait, so this
# thread does get scheduled and os._exit(2) works mid-wedge.
WATCHDOG_S = 1800
_done = threading.Event()


def _last_measured(here=None):
  """Most recent prior-round bench record (BENCH_r*.json) that holds a
  real measurement, so a wedged tunnel still surfaces the known number —
  clearly labeled as a PRIOR measurement, not this run's. Walks rounds
  newest-first by NUMERIC round index (lexicographic order breaks past
  r99) and skips rounds that themselves errored (watchdog lines carry an
  'error' key and value 0.0)."""
  import glob
  import re
  here = here or os.path.dirname(os.path.abspath(__file__))

  def round_idx(path):
    m = re.search(r"BENCH_r(\d+)\.json$", os.path.basename(path))
    return int(m.group(1)) if m else -1

  for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json")),
                     key=round_idx, reverse=True):
    try:
      with open(path) as f:
        rec = json.load(f)
    except (OSError, json.JSONDecodeError):
      continue
    parsed = rec.get("parsed") or {}
    if not parsed or "error" in parsed or rec.get("rc", 0) != 0:
      continue
    return {"file": os.path.basename(path),
            "value": parsed.get("value"),
            "vs_baseline": parsed.get("vs_baseline")}
  return None


def _watchdog():
  if _done.wait(WATCHDOG_S):
    return
  print(json.dumps({
      "metric": "cifar10_ddpmpp_train_imgs_per_sec_per_chip",
      "value": 0.0,
      "unit": "imgs/sec/chip",
      "vs_baseline": 0.0,
      "error": (f"watchdog: no result after {WATCHDOG_S}s — device init or "
                "compile never completed (wedged axon tunnel?)"),
      "last_measured_prior_round": _last_measured(),
  }), flush=True)
  os._exit(2)


def main():
  threading.Thread(target=_watchdog, daemon=True).start()
  from soft_truncation_tpu.losses import get_optimizer
  from soft_truncation_tpu.models import create_model
  from soft_truncation_tpu.parallel import (batch_sharding, make_mesh,
                                            replicated_sharding)
  from soft_truncation_tpu.sde import get_sde
  from soft_truncation_tpu.train import init_train_state, make_train_step
  from __graft_entry__ import _flagship_config

  config = _flagship_config()
  config.training.batch_size = BATCH
  # TPU-native production configuration: bf16 MXU compute (params/norms
  # stay f32) and the fast hardware PRNG for dropout masks. f32+threefry
  # ("reference-exact" mode) measures ~1255 imgs/s on a v5e chip.
  config.tpu.compute_dtype = "bfloat16"
  config.tpu.norm_dtype = "bfloat16"
  # Keep the config's rng record in sync with the live impl: dropout_bits
  # defaults to 'auto' and resolves against jax_default_prng_impl at model
  # build (32 under rbg — packed masks only pay under threefry; see
  # configs/base.py and benchmarks/train_sweep.jsonl rbg pair).
  config.tpu.rng_impl = "unsafe_rbg"
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
      jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 32, 32, 3)) * 2 - 1,
      bs)
  state = jax.device_put(state, rs)

  # XLA's own cost model for the compiled step: FLOPs for the MFU figure,
  # bytes for the HBM roofline (see benchmarks/ROOFLINE.md)
  compiled = jitted.lower(state, batch, jax.random.PRNGKey(2)).compile()
  ca = compiled.cost_analysis() or {}
  step_flops = float(ca.get("flops", 0.0))
  step_bytes = float(ca.get("bytes accessed", 0.0))

  key = jax.random.PRNGKey(2)
  for i in range(WARMUP):
    key, k = jax.random.split(key)
    state, losses = jitted(state, batch, k)
  # NOTE: fence with an actual value fetch — under remote-execution
  # runtimes (axon tunnel) block_until_ready can return before the
  # computation finishes, inflating throughput ~10x.
  float(losses.mean())

  t0 = time.perf_counter()
  for i in range(ITERS):
    key, k = jax.random.split(key)
    state, losses = jitted(state, batch, k)
  float(losses.mean())
  dt = time.perf_counter() - t0

  n_chips = jax.device_count()
  imgs_per_sec = BATCH * ITERS / dt
  per_chip = imgs_per_sec / n_chips
  step_s = dt / ITERS
  # TPU v5e (v5 lite) per-chip peaks; MFU/HBM% are vs these.
  peak_flops = 197e12 if "v5 lite" in str(jax.devices()[0]) else None
  peak_hbm = 819e9 if peak_flops else None
  hbm_frac = (step_bytes / step_s / n_chips / peak_hbm) if peak_hbm else None
  # This program is HBM-bandwidth bound (benchmarks/ROOFLINE.md): the
  # speed-of-light step time on this chip is hbm_bytes/819GBps, so the
  # measured hbm_frac IS the fraction of physics achieved. Report the
  # ceiling next to vs_baseline so 1.5x reads as ~95%-of-roofline on a
  # v5e, not as 50%-of-the-3x-target: reaching 3x of the (assumed) A100
  # number needs more HBM bandwidth (v5p: 2.8x, v6e: 2x v5e's) or a
  # program-level byte diet, not better scheduling of this program.
  ceiling_per_chip = (per_chip / hbm_frac) if hbm_frac else None
  # Disarm BEFORE printing: a run that finishes right at WATCHDOG_S must
  # not emit a second (error) JSON line after the real one ("ONE line"
  # contract) or exit 2 on success.
  _done.set()
  print(json.dumps({
      "metric": "cifar10_ddpmpp_train_imgs_per_sec_per_chip",
      "value": round(per_chip, 2),
      "unit": "imgs/sec/chip",
      "vs_baseline": round(per_chip / ASSUMED_A100_IMGS_PER_SEC, 3),
      "batch": BATCH,
      "step_ms": round(step_s * 1000, 2),
      "mfu": (round(step_flops / step_s / n_chips / peak_flops, 4)
              if peak_flops else None),
      "hbm_frac": round(hbm_frac, 4) if hbm_frac else None,
      "roofline_frac": round(hbm_frac, 4) if hbm_frac else None,
      "vs_baseline_ceiling": (
          round(ceiling_per_chip / ASSUMED_A100_IMGS_PER_SEC, 3)
          if ceiling_per_chip else None),
      "flops_per_step": step_flops,
      "hbm_bytes_per_step": step_bytes,
  }))


if __name__ == "__main__":
  main()
