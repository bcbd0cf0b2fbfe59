#!/bin/bash
# Round-4 serialized TPU measurement session. Run ONE instance only —
# every step is a separate TPU process run strictly in sequence, each
# bounded by timeout (the wedged-tunnel failure mode). Logs to
# logs/r4_tpu_session.log; JSON rows land in benchmarks/*.jsonl via the
# tools themselves. Steps continue on individual failure so one flaky
# compile doesn't kill the batch — but a wedged probe aborts everything
# (nothing else can succeed, and 14 full timeouts would burn the round).
set -u
cd "$(dirname "$0")/.."
LOG=logs/r4_tpu_session.log
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

echo "=========== r4 TPU session start $(date -u) ==========="

if ! step probe 420 python tools/tpu_probe.py --timeout 300; then
  echo "!!! TPU probe failed — aborting session (tunnel wedged?)"
  exit 2
fi

# 1. dropout-bits / rng A/B (VERDICT #4) — same-session 4-point grid
step "sweep rng=threefry bits=32" 1800 python tools/bench_train_sweep.py \
  batch=128 remat=none rng=threefry2x32 dropout_bits=32
step "sweep rng=threefry bits=16" 1800 python tools/bench_train_sweep.py \
  batch=128 remat=none rng=threefry2x32 dropout_bits=16
step "sweep rng=threefry bits=8" 1800 python tools/bench_train_sweep.py \
  batch=128 remat=none rng=threefry2x32 dropout_bits=8
step "sweep rng=unsafe_rbg bits=32" 1800 python tools/bench_train_sweep.py \
  batch=128 remat=none rng=unsafe_rbg dropout_bits=32

# 2. fused GN+SiLU+conv: standalone (VERDICT #8)
step "gn_conv standalone" 2400 python tools/bench_gn_conv.py 64 128

# 3. Picard A/Bs at the trained operating point (VERDICT #1b)
step "picard b1 w8" 2700 python tools/bench_sampling.py --picard \
  --workdir=workdirs/uncsn_syn --window=8 1
step "picard b1 w16" 2700 python tools/bench_sampling.py --picard \
  --workdir=workdirs/uncsn_syn --window=16 1
step "picard b4 w8" 2700 python tools/bench_sampling.py --picard \
  --workdir=workdirs/uncsn_syn --window=8 4
step "picard_dpm b1" 2700 python tools/bench_sampling.py --picard-dpm \
  --workdir=workdirs/uncsn_syn 1
step "picard_dpm b4" 2700 python tools/bench_sampling.py --picard-dpm \
  --workdir=workdirs/uncsn_syn 4

# 4. fused GN+SiLU+conv in-graph A/B (VERDICT #8; Pallas-FIR precedent:
#    standalone wins must survive the in-graph test)
step "dpm sampler baseline" 2400 python tools/bench_sampling.py --dpm 64
step "dpm sampler gnconv" 2400 env SOFT_TRUNCATION_PALLAS_GNCONV=1 \
  python tools/bench_sampling.py --dpm 64
step "pc sampler baseline b64" 2400 python tools/bench_sampling.py 64
step "pc sampler gnconv b64" 3000 env SOFT_TRUNCATION_PALLAS_GNCONV=1 \
  python tools/bench_sampling.py 64

# 5. FID-50k with the REAL Flax InceptionV3 featurizer (VERDICT #2):
#    same production run_lib.evaluate path as round 3's record, but the
#    extractor is the jitted on-device InceptionV3 (random-init npz in
#    workdirs/assets — throughput is weight-independent) with
#    fid_resize=device (1-core host PIL would gate at ~20 ms/img).
step "fid50k flax featurize" 7200 python -m soft_truncation_tpu.main \
  --config soft_truncation_tpu/configs/ve/CIFAR10/uncsnpp_st.py \
  --workdir workdirs/uncsn_syn --assetdir workdirs/assets --mode eval \
  --eval_folder eval_flax \
  --config.data.dataset=Synthetic \
  --config.eval.enable_sampling=True --config.eval.enable_loss=False \
  --config.eval.enable_bpd=False --config.eval.num_samples=50000 \
  --config.sampling.method=dpm_solver --config.sampling.batch_size=64 \
  --config.tpu.compute_dtype=bfloat16 --config.tpu.norm_dtype=bfloat16 \
  --config.tpu.fid_resize=device

# 6. metric-discrimination curve (VERDICT #3): fresh 20k-step training
#    run on synthetic data with in-training FID (2048 samples, DPM-50,
#    flax extractor, real stats streamed+cached) + NELBO bpd at every
#    2.5k-step snapshot. Evidence that training improves the metrics —
#    the closest quality-parity proxy zero-egress allows.
step "metric curve train 20k" 14400 python -m soft_truncation_tpu.main \
  --config soft_truncation_tpu/configs/ve/CIFAR10/uncsnpp_st.py \
  --workdir workdirs/curve_syn --assetdir workdirs/assets --mode train \
  --config.data.dataset=Synthetic \
  --config.training.n_iters=20000 --config.training.snapshot_freq=2500 \
  --config.training.snapshot_freq_for_preemption=2500 \
  --config.training.snapshot_sampling=True \
  --config.eval.enable_bpd=True --config.eval.nelbo_iter=4 \
  --config.eval.nll_iter=0 --config.eval.num_samples=2048 \
  --config.sampling.method=dpm_solver --config.sampling.batch_size=64 \
  --config.tpu.compute_dtype=bfloat16 --config.tpu.norm_dtype=bfloat16 \
  --config.tpu.fid_resize=device

echo "=========== r4 TPU session end $(date -u) ==========="
