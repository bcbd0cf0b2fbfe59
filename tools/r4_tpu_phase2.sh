#!/bin/bash
# Round-4 phase 2: runs AFTER tools/r4_tpu_session.sh exits (the watcher
# in /tmp serializes on its PID). Same discipline: one TPU process at a
# time, every step bounded by timeout.
set -u
cd "$(dirname "$0")/.."
LOG=logs/r4_tpu_phase2.log
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

echo "=========== r4 phase 2 start $(date -u) ==========="

if ! step probe 420 python tools/tpu_probe.py --timeout 300; then
  echo "!!! TPU probe failed — aborting phase 2"
  exit 2
fi

# 1. fused GN+SiLU+conv standalone A/B — the Mosaic-legal kernel
#    (f33cf81); the in-graph A/B already ran in the main session.
step "gn_conv standalone" 2400 python tools/bench_gn_conv.py 64 128

# 2. Picard A/Bs at the 20k-step checkpoint (workdirs/curve_syn, written
#    by the main session's metric-curve run) — the one unexplored
#    variable: a strongly-trained score contracts faster.
step "picard 20k b1 w8" 2700 python tools/bench_sampling.py --picard \
  --workdir=workdirs/curve_syn --window=8 1
step "picard 20k b1 w16 tol1e-2" 2700 python tools/bench_sampling.py \
  --picard --workdir=workdirs/curve_syn --window=16 --tol=1e-2 1
step "picard_dpm 20k b1" 2700 python tools/bench_sampling.py \
  --picard-dpm --workdir=workdirs/curve_syn 1
step "picard_dpm 20k b1 tol1e-2" 2700 python tools/bench_sampling.py \
  --picard-dpm --workdir=workdirs/curve_syn --tol=1e-2 1

# 3. driver-surface recheck on the real chip (verify skill surface 1)
step "entry compile check" 1200 python -c "import __graft_entry__; f,a = __graft_entry__.entry(); import jax; print(jax.jit(f).lower(*a).compile())"

echo "=========== r4 phase 2 end $(date -u) ==========="
