#!/bin/bash
# Round-3 TPU session, part B5: W=8 kernel rb/hp sweep (the flagship
# window moved to 8 on the held-out study; larger row blocks amortize
# the (w-1+rb)/rb slab-strip overhead that is 2x at rb=8), then the
# sustained-training soak (VERDICT r2 item 5) at the shipped defaults.
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

for rb in 8 16 32; do
  for hp in 2 4; do
    CHECK_WINDOW=8 DEFORM_RB=$rb DEFORM_HP=$hp \
      run "w8_rb${rb}_hp${hp}" 1200 python tools/check_pallas_tpu.py
  done
done

run soak_250 3600 python tools/soak_train.py --epochs 250 --out "$OUT/soak"
run soak_500 3600 python tools/soak_train.py --epochs 500 --resume --out "$OUT/soak"

echo "part B5 done $(date -u +%H:%M:%S)" | tee -a "$OUT/runbook.log"
