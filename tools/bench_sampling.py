"""Sampling throughput benchmark: PC / ODE / DPM-Solver / parallel-in-
time Picard samplers (UNCSN++ config) on the real TPU.

Projects FID-50k sampling wall-clock (BASELINE.md metric). Run standalone:
  python tools/bench_sampling.py [--ode|--dpm|--picard|--picard-dpm]
      [--workdir=<dir>] [--no-compile-cache] [batch ...]
Default sweep: 256 512 1024 (PC) / 64 128 256 (ODE, DPM) / 1 4 16
(picard paths — a small-batch LATENCY A/B vs the sequential sampler in
the same process). --workdir loads a trained EMA checkpoint (e.g.
workdirs/uncsn_syn): Picard sweep counts at random init are
unrepresentative. Appends one JSON record per batch size to
benchmarks/sampling.jsonl; each record carries "compile_cache" so
compile_s can be read as cold vs warm.
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

CONFIG_PATH = "soft_truncation_tpu/configs/ve/CIFAR10/uncsnpp_st.py"

# --bf16-norms: GroupNorm statistics in bf16 — measured 9% faster PC
# sampling / 5% faster DPM at batch 64 (forward-only has no backward to
# pay the train-path penalty); default f32 matches parity numerics.
BF16_NORMS = "--bf16-norms" in sys.argv


def _load_config(batch: int):
  import importlib.util
  spec = importlib.util.spec_from_file_location("c", CONFIG_PATH)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  config = mod.get_config()
  config.sampling.batch_size = batch
  config.tpu.compute_dtype = "bfloat16"
  if BF16_NORMS:
    config.tpu.norm_dtype = "bfloat16"
  jax.config.update("jax_default_prng_impl", "unsafe_rbg")
  return config


def _setup(config, batch: int, build_state: bool = True):
  """Shared model/state/sampler construction for all three sampler paths.

  build_state=False skips model.init + optimizer init on the device (used
  by the roofline probe, which only needs the sampler callable — its
  model/params arguments come from the main setup)."""
  from soft_truncation_tpu.data import get_data_inverse_scaler
  from soft_truncation_tpu.models import create_model
  from soft_truncation_tpu.sample import get_sampling_fn
  from soft_truncation_tpu.sde import get_sde
  from soft_truncation_tpu.train import init_train_state
  from soft_truncation_tpu.losses import get_optimizer

  sde = get_sde(config)
  model = create_model(config)
  state = None
  if build_state:
    state = init_train_state(jax.random.PRNGKey(0), config, model,
                             get_optimizer(config))
  shape = (batch, 32, 32, 3)
  sampler = get_sampling_fn(config, sde, shape,
                            get_data_inverse_scaler(config),
                            config.sampling.truncation_time)
  if not getattr(sampler, "self_jitting", False):
    sampler = jax.jit(sampler, static_argnums=0)
  return sde, model, state, sampler


def _time_sampler(sampler, model, params, return_samples=False):
  """(compile_s, steady_batch_s, nfe[, samples]) with value-fetch fencing
  (axon tunnel: block_until_ready returns early). The steady-state call
  uses PRNGKey(2); return_samples hands its output back so callers
  comparing samplers do not pay an extra full sampling pass."""
  t0 = time.perf_counter()
  samples, nfe = sampler(model, params, jax.random.PRNGKey(1))
  float(samples.mean())
  compile_s = time.perf_counter() - t0

  t0 = time.perf_counter()
  samples, nfe = sampler(model, params, jax.random.PRNGKey(2))
  float(samples.mean())
  dt = time.perf_counter() - t0
  if return_samples:
    return compile_s, dt, int(nfe), samples
  return compile_s, dt, int(nfe)


def _record(base: dict, compile_s: float, dt: float, nfe: int,
            batch: int) -> dict:
  rec = dict(base)
  rec.update({
      "config": "ve/CIFAR10/uncsnpp_st", "nfe": nfe, "batch": batch,
      "compute_dtype": "bfloat16",
      "norm_dtype": "bfloat16" if BF16_NORMS else "float32",
      "compile_cache": "on" if COMPILE_CACHE else "off",
      "compile_s": round(compile_s, 1),
      "batch_s": round(dt, 2),
      "ms_per_nfe": round(dt / nfe * 1000, 3),
      "imgs_per_sec": round(batch / dt, 2),
      "fid50k_min_per_chip": round(dt * (50000 / batch) / 60, 1),
      "device": str(jax.devices()[0]),
  })
  print(json.dumps(rec))
  return rec


def run_one(batch: int) -> dict:
  """PC sampler (N=1000, langevin corrector => 2000 NFE/batch)."""
  config = _load_config(batch)
  # chunked dispatches: one full-N scan at batch>=256 runs 30s+ per device
  # call, which trips the remote-runtime watchdog (observed worker crash);
  # chunk=100 keeps each dispatch ~2-4s, results bit-identical
  config.sampling.chunk = 100
  sde, model, state, sampler = _setup(config, batch)

  # roofline probe: XLA cost model of a short single-scan sampler gives
  # per-model-eval FLOPs/bytes (scales linearly in N; N=10 compiles fast)
  probe_cfg = _load_config(batch)
  probe_cfg.model.num_scales = 10
  _, _, _, probe = _setup(probe_cfg, batch, build_state=False)
  lowered = probe.lower(model, state.params, jax.random.PRNGKey(0))
  ca = lowered.compile().cost_analysis() or {}
  # XLA's cost model counts a scan body ONCE regardless of trip count
  # (verified: flops(N=10) == flops(N=20)), so the compiled program holds
  # scan-body (corrector+predictor = 2 evals) + final denoise (1 eval)
  probe_evals = 3
  flops_per_eval = float(ca.get("flops", 0.0)) / probe_evals
  bytes_per_eval = float(ca.get("bytes accessed", 0.0)) / probe_evals

  compile_s, dt, nfe = _time_sampler(sampler, model, state.params)
  return _record({
      "sampler": "pc", "N": int(sde.N),
      "flops_per_eval": flops_per_eval,
      "hbm_bytes_per_eval": bytes_per_eval,
      # vs v5e peaks (197 TF/s bf16, 819 GB/s)
      "eval_mfu": round(flops_per_eval / (dt / nfe) / 197e12, 4),
      "eval_hbm_frac": round(bytes_per_eval / (dt / nfe) / 819e9, 4),
  }, compile_s, dt, nfe, batch)


def run_one_ode(batch: int) -> dict:
  """ODE (probability-flow) sampler: on-device adaptive dopri5 at the
  reference's default tolerances (rtol=atol=1e-5, sampling.py:436-504).

  The reference offers the same sampler (sampling.method='ode') but
  integrates with scipy on the host — hundreds of host<->device round
  trips per batch. Fully on-device, the adaptive solver needs ~10x fewer
  NFE than PC-2000 for the same config, which is the big FID-50k
  wall-clock lever.
  """
  config = _load_config(batch)
  config.sampling.method = "ode"
  _, model, state, sampler = _setup(config, batch)
  compile_s, dt, nfe = _time_sampler(sampler, model, state.params)
  return _record({
      "sampler": "ode",
      # CAVEAT: with the zero-initialized bench network (init_scale=0 =>
      # score ~ 0) the flow is trivially smooth and nfe is unrealistically
      # low. ms_per_nfe is the honest per-eval cost; project wall-clock
      # with a trained-score NFE (see benchmarks/ROOFLINE.md).
      "rtol": 1e-5, "atol": 1e-5,
  }, compile_s, dt, nfe, batch)


def run_one_dpm(batch: int, steps: int = 50) -> dict:
  """DPM-Solver++(2M) (beyond-parity fast sampler): fixed NFE = steps+1,
  one score eval per step, so the random-weights timing IS the production
  cost (unlike the adaptive ODE path)."""
  config = _load_config(batch)
  config.sampling.method = "dpm_solver"
  config.sampling.dpm_steps = steps
  _, model, state, sampler = _setup(config, batch)
  compile_s, dt, nfe = _time_sampler(sampler, model, state.params)
  return _record({"sampler": "dpm_solver", "steps": steps},
                 compile_s, dt, nfe, batch)


def _maybe_trained_params(config, model, state):
  """EMA params from --workdir=<dir> (the honest operating point for the
  Picard A/B: Picard sweep counts depend on the score's conditioning —
  trained scores are contracting, random-init ones are not), else the
  random-init params. Validates the path BEFORE constructing a
  CheckpointManager (whose __init__ mkdirs under the workdir — a typo'd
  path must not leave junk directories), and falls back from the rolling
  meta checkpoint to the latest numbered snapshot."""
  wd = next((a.split("=", 1)[1] for a in sys.argv
             if a.startswith("--workdir=")), None)
  if not wd:
    return state.params, False, 0
  if not os.path.isdir(wd):
    raise SystemExit(f"--workdir={wd}: no such directory")
  from soft_truncation_tpu.train import CheckpointManager
  ckpt = CheckpointManager(wd)
  restored = ckpt.restore_meta(state)
  if restored is None:
    step = ckpt.latest_snapshot_step()
    if step is not None:
      restored = ckpt.restore_snapshot(state, step)
  if restored is None:
    raise SystemExit(f"--workdir={wd}: no meta or snapshot checkpoint")
  return jax.device_put(restored.ema_params), True, int(restored.step)


def _chaos_probe(sampler, model, params, seq_samples):
  """Lyapunov probe for the SEQUENTIAL chain: rerun it with the same key
  but params perturbed by 1e-6 relative. If the final-sample RMS
  difference is O(sample scale), the chain amplifies ulp-level
  perturbations to full decorrelation — then rms_vs_sequential measures
  the CHAIN's chaos, not the parallel sampler's error, and only
  distributional metrics are meaningful. Returns (chaos_rms,
  sample_rms)."""
  import numpy as np
  perturbed = jax.tree.map(
      lambda p: p * (1.0 + 1e-6) if p.dtype.kind == "f" else p, params)
  _, _, _, s2 = _time_sampler(sampler, model, perturbed,
                              return_samples=True)
  chaos = float(np.sqrt(np.mean(
      (np.asarray(s2) - np.asarray(seq_samples)) ** 2)))
  scale = float(np.sqrt(np.mean(np.asarray(seq_samples) ** 2)))
  return chaos, scale


def run_one_picard(batch: int, window: int = 0, tol: float = 1e-3) -> dict:
  """Parallel-in-time Picard PC (sample/parallel.py, beyond parity): a
  LATENCY play for small batches — batches the time axis (window x batch
  images per network call). Wins only while window*batch stays under the
  chip's utilization knee (~batch 16-32 on v5e for CIFAR NCSN++), so the
  default window is the config default (16), not scaled up. Times the
  sequential PC sampler at the same batch in the same process (same-
  process A/B), reports the RMS deviation of the Picard samples from the
  sequential trajectory with the same PRNG key (tol=0 would make it
  exact in exact arithmetic), and runs a chaos probe on the sequential
  chain so that deviation can be read against the chain's own
  sensitivity (Langevin-corrector chains with weak scores are chaotic:
  trajectory RMS is then meaningless and the probe proves it)."""
  config = _load_config(batch)
  config.sampling.chunk = 100
  sde, model, state, sampler = _setup(config, batch)
  params, trained, trained_steps = _maybe_trained_params(config, model,
                                                         state)
  seq_compile_s, seq_dt, seq_nfe, seq_samples = _time_sampler(
      sampler, model, params, return_samples=True)
  chaos_rms, sample_rms = _chaos_probe(sampler, model, params, seq_samples)

  window = window or int(_load_config(batch).sampling.picard_window)
  pcfg = _load_config(batch)
  pcfg.sampling.method = "picard"
  pcfg.sampling.picard_window = window
  pcfg.sampling.picard_tol = tol
  # Explicit experimentation opt-in: tol>0 on the stochastic PC chain is
  # refused by default (decorrelated samples — parallel.py guard); this
  # tool exists precisely to MEASURE that regime, rms-vs-seq included.
  pcfg.sampling.picard_unsafe_tol = True
  pcfg.sampling.chunk = 100  # bounded dispatches, like the sequential side
  _, _, _, psampler = _setup(pcfg, batch, build_state=False)
  compile_s, dt, nfe, psamples = _time_sampler(psampler, model, params,
                                               return_samples=True)

  import numpy as np
  rms = float(np.sqrt(np.mean(
      (np.asarray(psamples) - np.asarray(seq_samples)) ** 2)))
  return _record({
      "sampler": "picard", "N": int(sde.N), "window": window, "tol": tol,
      "tol_semantics": "relative-to-state-RMS",
      "latency_play": True,  # fid50k_min_per_chip is meaningless here
      "trained_score": trained, "trained_steps": trained_steps,
      "seq_batch_s": round(seq_dt, 2), "seq_nfe": seq_nfe,
      "latency_speedup_vs_pc": round(seq_dt / dt, 2),
      "rms_vs_sequential": round(rms, 5),
      "seq_chaos_rms_1e-6_param_perturbation": round(chaos_rms, 5),
      "seq_sample_rms": round(sample_rms, 5),
  }, compile_s, dt, nfe, batch)


def run_one_picard_dpm(batch: int, steps: int = 50,
                       tol: float = 1e-3) -> dict:
  """Parallel-in-time DPM-Solver++(2M) latency A/B vs the sequential
  solver (same process, same trained-or-random params; deterministic
  chain, so rms_vs_sequential at tol=0 is pure fp reordering)."""
  config = _load_config(batch)
  config.sampling.method = "dpm_solver"
  config.sampling.dpm_steps = steps
  sde, model, state, sampler = _setup(config, batch)
  params, trained, trained_steps = _maybe_trained_params(config, model,
                                                         state)
  _, seq_dt, seq_nfe, seq_samples = _time_sampler(
      sampler, model, params, return_samples=True)

  pcfg = _load_config(batch)
  pcfg.sampling.method = "picard_dpm"
  pcfg.sampling.dpm_steps = steps
  pcfg.sampling.picard_window = 0  # whole trajectory: one block
  pcfg.sampling.picard_tol = tol
  _, _, _, psampler = _setup(pcfg, batch, build_state=False)
  compile_s, dt, nfe, psamples = _time_sampler(psampler, model, params,
                                               return_samples=True)

  import numpy as np
  rms = float(np.sqrt(np.mean(
      (np.asarray(psamples) - np.asarray(seq_samples)) ** 2)))
  return _record({
      "sampler": "picard_dpm", "steps": steps, "tol": tol,
      "tol_semantics": "relative-to-state-RMS",
      "latency_play": True,  # fid50k_min_per_chip is meaningless here
      "trained_score": trained, "trained_steps": trained_steps,
      "seq_batch_s": round(seq_dt, 2), "seq_nfe": seq_nfe,
      "latency_speedup_vs_dpm": round(seq_dt / dt, 2),
      "rms_vs_sequential": round(rms, 5),
  }, compile_s, dt, nfe, batch)


def main():
  args = [a for a in sys.argv[1:]]
  ode = "--ode" in args
  dpm = "--dpm" in args
  picard = "--picard" in args
  picard_dpm = "--picard-dpm" in args
  window = next((int(a.split("=", 1)[1]) for a in args
                 if a.startswith("--window=")), 0)
  tol = next((float(a.split("=", 1)[1]) for a in args
              if a.startswith("--tol=")), 1e-3)
  args = [a for a in args if not a.startswith("--")]
  batches = [int(a) for a in args] if args else (
      [1, 4, 16] if (picard or picard_dpm) else
      [64, 128, 256] if (ode or dpm) else [256, 512, 1024])
  if picard:
    fn = lambda b: run_one_picard(b, window=window, tol=tol)
  elif picard_dpm:
    fn = lambda b: run_one_picard_dpm(b, tol=tol)
  else:
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
