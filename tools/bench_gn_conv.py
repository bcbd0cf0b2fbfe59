"""On-chip A/B for the fused GroupNorm+SiLU+conv3x3 Pallas kernel
(ops/pallas/gn_conv.py) vs the XLA chain it would replace.

Measures the hottest res-block shapes of the flagship model (ROOFLINE.md
"Implications" item 2 estimated ~10% from removing the normalized-slab
HBM write+read). Standalone first; an in-graph sampler A/B only makes
sense if this wins (Pallas-FIR precedent: fusion-barrier effects can
erase standalone wins).

Usage: python tools/bench_gn_conv.py [batch ...]   (default 64 128)
Appends JSON records to benchmarks/train_sweep.jsonl with
"bench": "gn_conv_fused".
"""

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


def _time(fn, *args, iters=30):
  out = fn(*args)
  jnp.asarray(out).block_until_ready()
  float(out.mean())  # value fetch fences the tunnel
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  float(out.mean())
  return (time.perf_counter() - t0) / iters


def run_one(batch: int, h: int, c: int, o: int, dtype=jnp.bfloat16) -> dict:
  from soft_truncation_tpu.ops.pallas.gn_conv import (
      gn_silu_conv3x3, gn_silu_conv3x3_reference, gn_stats)
  groups = min(c // 4, 32)
  ks = jax.random.split(jax.random.PRNGKey(0), 5)
  x = jax.random.normal(ks[0], (batch, h, h, c), dtype)
  gamma = jax.random.normal(ks[1], (c,), jnp.float32) * 0.2 + 1.0
  beta = jax.random.normal(ks[2], (c,), jnp.float32) * 0.1
  w = (jax.random.normal(ks[3], (3, 3, c, o), jnp.float32)
       / (9 * c) ** 0.5).astype(dtype)
  b = jnp.zeros((o,), dtype)

  ref = jax.jit(lambda x: gn_silu_conv3x3_reference(
      x, gamma, beta, w, b, groups))

  @jax.jit
  def fused(x):
    mean, rsqrt = gn_stats(x, groups)
    return gn_silu_conv3x3(x, mean, rsqrt, gamma, beta, w, b, groups)

  t_ref = _time(ref, x)
  t_fused = _time(fused, x)
  import numpy as np
  err = float(jnp.max(jnp.abs(
      (fused(x).astype(jnp.float32) - ref(x).astype(jnp.float32)))))
  flops = 2 * batch * h * h * c * o * 9
  rec = {
      "bench": "gn_conv_fused", "batch": batch, "hw": h, "c": c, "o": o,
      "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
      "xla_ms": round(t_ref * 1e3, 3),
      "fused_ms": round(t_fused * 1e3, 3),
      "speedup": round(t_ref / t_fused, 3),
      "max_abs_err": err,
      "xla_mfu": round(flops / t_ref / 197e12, 4),
      "fused_mfu": round(flops / t_fused / 197e12, 4),
      "compile_cache": "on" if COMPILE_CACHE else "off",
      "device": str(jax.devices()[0]),
  }
  print(json.dumps(rec), flush=True)
  return rec


def main():
  batches = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or [
      64, 128]
  recs = []
  for bsz in batches:
    # flagship pyramid hot shapes: 32^2 x 128 (dominant), 16^2 x 256
    recs.append(run_one(bsz, 32, 128, 128))
    recs.append(run_one(bsz, 16, 256, 256))
  out = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), "benchmarks", "train_sweep.jsonl")
  with open(out, "a") as f:
    for rec in recs:
      f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
  main()
