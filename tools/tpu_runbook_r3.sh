#!/bin/bash
# Round-3 TPU session runbook. Run as soon as the axon tunnel is alive:
#   bash tools/tpu_runbook_r3.sh [outdir]
# Sequential (ONE TPU process at a time — concurrent processes poison the
# tunnel); each step logs to its own file and later steps run even if an
# earlier one fails, so a mid-session tunnel death leaves partial results.
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

# 5. Held-out window/accuracy study at realistic scale (VERDICT item 3):
#    64 train + 16 held-out 512^2 scenes, 10 varied-size occluding
#    instances each; W=4 vs W=8 vs exact-unclamped, 200 steps.
run window_study_512 7200 python tools/window_study.py \
  --windows 4 8 --with-exact --hw 512 --epochs 25 \
  --train-images 64 --heldout-images 16 --shapes 10 --r-range 8 80 \
  --batch 8 --queries 20 --max-instances 12 \
  --out work_dirs/wstudy512

# 6. Short soak first (compile shared with 7); then the full 500-step
#    soak with a mid-run auto-resume exercise.
run soak_250 3600 python tools/soak_train.py --epochs 250 --out "$OUT/soak"
run soak_500 3600 python tools/soak_train.py --epochs 500 --resume --out "$OUT/soak"

echo "runbook done $(date -u +%H:%M:%S)" | tee -a "$OUT/runbook.log"
