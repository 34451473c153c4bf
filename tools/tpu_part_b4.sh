#!/bin/bash
# Round-3 TPU session, part B4: held-out window/gtds studies at 512^2
# (VERDICT r2 item 3), then the sustained-training soak (item 5).
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

run window_study_512 9000 python tools/window_study.py \
  --windows 4 8 --with-exact --hw 512 --epochs 25 \
  --train-images 64 --heldout-images 16 --shapes 10 --r-range 8 80 \
  --batch 8 --queries 20 --max-instances 12 --num-points 1024 \
  --out work_dirs/wstudy512

run gtds_512 3600 python tools/window_study.py \
  --windows 4 --gtds 4 --hw 512 --epochs 25 \
  --train-images 64 --heldout-images 16 --shapes 10 --r-range 8 80 \
  --batch 8 --queries 20 --max-instances 12 --num-points 1024 \
  --no-eval-train --out work_dirs/wstudy512_gtds

run soak_250 3600 python tools/soak_train.py --epochs 250 --out "$OUT/soak"
run soak_500 3600 python tools/soak_train.py --epochs 500 --resume --out "$OUT/soak"

echo "part B4 done $(date -u +%H:%M:%S)" | tee -a "$OUT/runbook.log"
