#!/bin/bash
# Round-3 TPU session, part B2 (reordered): train bench first (short,
# fills the PERF.md k=4 TBD), then held-out studies, then soaks.
# ONE TPU process at a time.
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

# 4 (re-run with rb>=8 fix). Training-step throughput, shipped defaults.
run bench_train_k4b 2700 python tools/bench_train.py --batch 8 --iters 4

# 5. Held-out window/accuracy study at realistic scale (VERDICT item 3):
#    64 train + 16 held-out 512^2 scenes, 10 varied-size occluding
#    instances each; W=4 vs W=8 vs exact-unclamped, 25 epochs (200 steps).
run window_study_512 10800 python tools/window_study.py \
  --windows 4 8 --with-exact --hw 512 --epochs 25 \
  --train-images 64 --heldout-images 16 --shapes 10 --r-range 8 80 \
  --batch 8 --queries 20 --max-instances 12 --num-points 1024 \
  --out work_dirs/wstudy512

# 5b. k=4 GT point sampling vs the k=1 W4 row above, same held-out signal.
run gtds_512 3600 python tools/window_study.py \
  --windows 4 --gtds 4 --hw 512 --epochs 25 \
  --train-images 64 --heldout-images 16 --shapes 10 --r-range 8 80 \
  --batch 8 --queries 20 --max-instances 12 --num-points 1024 \
  --no-eval-train --out work_dirs/wstudy512_gtds

# 6. Short soak first (compile shared with the 500); then the full
#    500-step soak with a mid-run auto-resume exercise.
run soak_250 3600 python tools/soak_train.py --epochs 250 --out "$OUT/soak"
run soak_500 3600 python tools/soak_train.py --epochs 500 --resume --out "$OUT/soak"

echo "part B2 done $(date -u +%H:%M:%S)" | tee -a "$OUT/runbook.log"
