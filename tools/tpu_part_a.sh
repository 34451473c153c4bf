#!/bin/bash
# Round-3 TPU session, part A: kernel validation + bench numbers.
# (Part B — held-out window study + soaks — launches after these finish;
# ONE TPU process at a time, concurrent processes poison the tunnel.)
set -u
OUT=${1:-work_dirs/r3_tpu}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" | tee -a "$OUT/runbook.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S)" | tee -a "$OUT/runbook.log"
  tail -5 "$OUT/$name.log" | sed 's/^/    /'
  return $rc
}

# 1. Kernel-config validation on real Mosaic: new defaults (in-kernel
#    preps, int16 coords, cm store, HP=2), W=4 flagship shape.
CHECK_WINDOW=4 run kernel_new 1200 python tools/check_pallas_tpu.py

# 2. The headline bench (warms the flagship compile cache; probe-first).
run bench 2700 python bench.py
grep -h '"metric"' "$OUT/bench.log" | tail -1

# 3. Classic-prep kernel A/B (PERF.md before/after for the new defaults).
DEFORM_COMPACT=0 DEFORM_COORD16=0 DEFORM_OUT_T=0 CHECK_WINDOW=4 \
  run kernel_classic 1200 python tools/check_pallas_tpu.py

# 4. Training-step throughput, shipped defaults (fills the PERF.md TBD).
run bench_train_k4 2700 python tools/bench_train.py --batch 8 --iters 4

echo "part A done $(date -u +%H:%M:%S)" | tee -a "$OUT/runbook.log"
