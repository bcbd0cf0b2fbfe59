#!/bin/bash
# Round-4 phase 3: re-featurize the 50k-sample production eval with the
# He-init random InceptionV3 (see tools/make_random_inception_npz.py).
# The 782 sample shards from the round-4 FID-50k production run are
# cached (resumable sampling_io), so this re-runs ONLY restore +
# featurize + real-stats streaming + FID/IS — a production-path
# verification that healthy (non-degenerate) features flow end to end
# without hitting the singular-covariance sqrtm retry.
# Run ONE instance only; every step bounded by timeout (wedged-tunnel
# failure mode).
set -u
cd "$(dirname "$0")/.."
LOG=logs/r4_tpu_phase3.log
mkdir -p logs
exec >>"$LOG" 2>&1

step() {
  echo "=== [$(date -u +%H:%M:%S)] $1"
  shift
  timeout "$@"
  local rc=$?
  echo "=== rc=$rc [$(date -u +%H:%M:%S)]"
  return $rc
}

echo "=========== r4 phase 3 start $(date -u) ==========="

# the tunnel has been observed to degrade for tens of minutes and then
# recover: retry the (serialized, bounded) probe up to 6 times with
# 10-min gaps before giving up on the session.
ok=
for attempt in 1 2 3 4 5 6; do
  if step "probe (attempt $attempt)" 720 python tools/tpu_probe.py --timeout 600; then
    ok=1
    break
  fi
  echo "... probe attempt $attempt failed; sleeping 600s before retry"
  sleep 600
done
if [ -z "$ok" ]; then
  echo "!!! TPU probe failed 6x over ~70 min — aborting (tunnel wedged)"
  exit 2
fi

# drop feature caches computed with the old degenerate LeCun extractor
# (keep the sample shards — they are the expensive part and weight-
# independent)
rm -f workdirs/uncsn_syn/eval_flax/ckpt_2001_dpm_solver_trunc1e-05/statistics_*.npz
rm -f workdirs/uncsn_syn/eval_flax/ckpt_2001_dpm_solver_trunc1e-05/report_metrics.npz

step "fid50k re-featurize (He extractor)" 7200 \
  python -m soft_truncation_tpu.main \
  --config soft_truncation_tpu/configs/ve/CIFAR10/uncsnpp_st.py \
  --workdir workdirs/uncsn_syn --assetdir workdirs/assets --mode eval \
  --eval_folder eval_flax \
  --config.data.dataset=Synthetic \
  --config.eval.enable_sampling=True --config.eval.enable_loss=False \
  --config.eval.enable_bpd=False --config.eval.num_samples=50000 \
  --config.sampling.method=dpm_solver --config.sampling.batch_size=64 \
  --config.tpu.compute_dtype=bfloat16 --config.tpu.norm_dtype=bfloat16 \
  --config.tpu.fid_resize=device

echo "=========== r4 phase 3 end $(date -u) ==========="
