#!/bin/bash
# Round-5 serialized TPU measurement session. Run ONE instance only —
# every step is a separate TPU process run strictly in sequence, each
# bounded by timeout (the wedged-tunnel failure mode). Logs to
# logs/r5_tpu_session.log; JSON rows land in benchmarks/*.jsonl via the
# tools themselves.
set -u
cd "$(dirname "$0")/.."
LOG=logs/r5_tpu_session.log
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

echo "=========== r5 TPU session start $(date -u) ==========="

if ! step probe 420 python tools/tpu_probe.py --timeout 300; then
  echo "!!! TPU probe failed — aborting session (tunnel wedged?)"
  exit 2
fi

# 1. fp8 activation byte-diet A/B (VERDICT r4 #2): baseline vs
#    act=float8_e4m3, both arms in ONE process, pair-tagged
step "fp8 train A/B same-process" 4500 python - <<'EOF'
import importlib.util, json, os, sys
sys.path.insert(0, os.getcwd())
sys.argv = ["bench_train_sweep.py"]
spec = importlib.util.spec_from_file_location(
    "bts", "tools/bench_train_sweep.py")
bts = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bts)
run_one = bts.run_one
rows = []
rows.append(run_one(128, "none", False, "flagship"))
rows.append(run_one(128, "none", False, "flagship", act="float8_e4m3"))
with open("benchmarks/train_sweep.jsonl", "a") as f:
    for r in rows:
        r["pair"] = "r5_fp8_act_ab_same_process"
        f.write(json.dumps(r) + "\n")
EOF

# 2. exact-NLL cost A/B (VERDICT r4 #3): shared-primal x norm dtype,
#    four arms in ONE process (same-session rule)
step "nll shared-primal x norm-dtype A/B" 4500 python tools/bench_likelihood.py 64

# 3. fresh headline bench (VERDICT r4 #1 done-check: >=1990 imgs/s with
#    bytes back at ~50.2 GB under the dropout_bits auto default)
step "headline bench" 2400 python bench.py

# 4. driver entry compile-check (verify surface #1, single chip)
step "entry compile" 1800 python -c "import __graft_entry__; f,a = __graft_entry__.entry(); import jax; print(jax.jit(f).lower(*a).compile())"
