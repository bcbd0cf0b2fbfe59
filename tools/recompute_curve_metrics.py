"""Recompute the metric-discrimination curve OFFLINE from saved sample
shards (no re-sampling, no re-training).

Round-4 context (VERDICT #3): the 20k-step curve run saved 2048 DPM-50
samples + a NELBO-bpd report at every 2.5k-step snapshot
(workdirs/curve_syn), but its in-training FID was computed through the
LeCun-init random InceptionV3 whose pool_3 features collapse to ~2e-4
std — FID sat at numerical noise (~1.6e-4) and IS at exactly 1.0 for
every snapshot, i.e. zero discrimination. This tool re-featurizes the
SAVED samples with a healthy extractor (He-gain npz from
tools/make_random_inception_npz.py; probe: tools/probe_random_fid.py)
and rebuilds the steps -> FID/IS/KID curve, merging the already-measured
bpd series, so "training improves the metrics" is established from the
same artifacts. Reference analogue: the in-training eval hooks at
/root/reference/run_lib.py:91-113 (FID/IS per snapshot).

Runs on whatever platform JAX resolves (TPU if the tunnel is up; pass
--cpu to pin host). Writes one JSON line per snapshot to
benchmarks/curve_syn.jsonl and a report npz next to each snapshot's
samples.

Usage:
  python tools/recompute_curve_metrics.py [--workdir=workdirs/curve_syn]
      [--weights=workdirs/assets/inception_v3_weights.npz]
      [--num-data=2048] [--out=benchmarks/curve_syn.jsonl] [--cpu]
"""

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv):
  opts = {"workdir": "workdirs/curve_syn",
          "weights": "workdirs/assets/inception_v3_weights.npz",
          "num_data": 2048, "out": "benchmarks/curve_syn.jsonl",
          "cpu": False}
  for a in argv[1:]:
    if a == "--cpu":
      opts["cpu"] = True
    elif a.startswith("--workdir="):
      opts["workdir"] = a.split("=", 1)[1]
    elif a.startswith("--weights="):
      opts["weights"] = a.split("=", 1)[1]
    elif a.startswith("--num-data="):
      opts["num_data"] = int(a.split("=", 1)[1])
    elif a.startswith("--out="):
      opts["out"] = a.split("=", 1)[1]
    else:
      raise SystemExit(f"unknown arg {a}")
  return opts


def load_snapshot_samples(ckpt_dir: str, num_data: int) -> np.ndarray:
  def shard_idx(p):
    m = re.search(r"samples_(\d+)\.npz$", p)
    return int(m.group(1)) if m else 1 << 30
  shards = sorted(glob.glob(os.path.join(ckpt_dir, "samples_*.npz")),
                  key=shard_idx)
  out, seen = [], 0
  for p in shards:
    with np.load(p) as f:
      s = np.asarray(f["samples"])
    out.append(s)
    seen += len(s)
    if seen >= num_data:
      break
  assert out, f"no samples_*.npz under {ckpt_dir}"
  return np.concatenate(out)[:num_data]


def main():
  opts = parse_args(sys.argv)
  import jax
  if opts["cpu"]:
    jax.config.update("jax_platforms", "cpu")

  from soft_truncation_tpu.utils.compile_cache import (
      setup_compilation_cache_from_argv)
  setup_compilation_cache_from_argv()

  from soft_truncation_tpu.configs.ve.CIFAR10 import uncsnpp_st
  from soft_truncation_tpu.data import datasets
  from soft_truncation_tpu.eval.inception import FlaxInceptionExtractor
  from soft_truncation_tpu.eval.metrics import (
      compute_stats, frechet_distance, inception_score_from_probs,
      kernel_distance)

  # same data config the curve run trained with (tools/r4_tpu_session.sh
  # step 6): uncsnpp_st + Synthetic data, on-device 299px resize
  config = uncsnpp_st.get_config()
  config.data.dataset = "Synthetic"
  config.eval.num_samples = opts["num_data"]

  extractor = FlaxInceptionExtractor(opts["weights"], batch_size=128,
                                     resize_mode="device")
  wtag = os.path.basename(opts["weights"])

  # real-side statistics: stream the synthetic eval split, KEEP the raw
  # features (KID needs them, evaluation.py:181-182), cache by weights tag
  t0 = time.time()
  cache = os.path.join(opts["workdir"], "samples",
                       f"real_stats_flax_he_{opts['num_data']}.npz")
  if os.path.exists(cache):
    with np.load(cache) as f:
      mu_ref, cov_ref = f["mu"], f["cov"]
      real_feats = f["pool_3"]
    print(f"real stats: cache hit {cache}", flush=True)
  else:
    _, eval_ds = datasets.get_dataset(config, evaluation_only=True)
    feats, seen = [], 0
    for batch in eval_ds.as_numpy_iterator():
      imgs = np.clip(batch["image"] * 255.0, 0, 255).astype(np.uint8)
      imgs = imgs.reshape(-1, *imgs.shape[-3:])
      f, _ = extractor(imgs)
      feats.append(f)
      seen += len(imgs)
      if seen >= opts["num_data"]:
        break
    real_feats = np.concatenate(feats)[:opts["num_data"]]
    mu_ref, cov_ref = compute_stats(real_feats)
    np.savez_compressed(cache, mu=mu_ref, cov=cov_ref, pool_3=real_feats)
    print(f"real stats: streamed {len(real_feats)} imgs in "
          f"{time.time() - t0:.0f}s -> {cache}", flush=True)

  # per-snapshot: featurize saved samples -> FID/IS/KID; merge saved bpd
  ckpt_dirs = sorted(
      glob.glob(os.path.join(opts["workdir"], "samples", "ckpt_*")),
      key=lambda p: int(re.search(r"ckpt_(\d+)", p).group(1)))
  assert ckpt_dirs, f"no ckpt_* sample dirs under {opts['workdir']}/samples"
  rows = []
  for ckpt_dir in ckpt_dirs:
    step = int(re.search(r"ckpt_(\d+)", ckpt_dir).group(1))
    t1 = time.time()
    samples = load_snapshot_samples(ckpt_dir, opts["num_data"])
    feats, probs = extractor(samples)
    mu, cov = compute_stats(feats)
    row = {
        "benchmark": "metric_discrimination_curve",
        "step": step,
        "num_samples": int(len(samples)),
        "fid": float(frechet_distance(mu_ref, cov_ref, mu, cov)),
        "inception_score": float(inception_score_from_probs(probs)),
        "kid": float(kernel_distance(real_feats, feats)),
        "extractor": "flax_inception_v3",
        "extractor_weights": wtag + " (random He-init sqrt2 conv gain; "
                             "zero-egress — discrimination, not "
                             "published-FID comparable)",
        "sampler": os.path.basename(ckpt_dir).split("_", 2)[-1],
        "featurize_s": round(time.time() - t1, 1),
    }
    bpd_npz = os.path.join(opts["workdir"], "bpd", f"bpd_{step}.npz")
    if os.path.exists(bpd_npz):
      with np.load(bpd_npz) as f:
        for k in f.files:
          row[k] = float(f[k])
    np.savez_compressed(os.path.join(ckpt_dir, "report_metrics_he.npz"),
                        fid=row["fid"], inception_score=row["inception_score"],
                        kid=row["kid"])
    rows.append(row)
    print(json.dumps(row), flush=True)

  with open(opts["out"], "a") as f:
    for row in rows:
      f.write(json.dumps(row) + "\n")

  print(f"\n{'step':>6} {'fid':>10} {'is':>8} {'kid':>10} {'nelbo_bpd':>10}")
  for r in rows:
    print(f"{r['step']:>6} {r['fid']:>10.3f} {r['inception_score']:>8.4f} "
          f"{r['kid']:>10.5f} {r.get('nelbo_bpd_mean', float('nan')):>10.4f}")


if __name__ == "__main__":
  main()
