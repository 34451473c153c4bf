#!/bin/bash
# Round-3 TPU session, part B3: short measurement pass first —
# (a) train-step bench at shipped defaults (fills the PERF.md k=4 TBD,
#     re-run with the rb>=8 Mosaic fix),
# (b) fresh pixel-decoder device trace (the round-6 trace predates
#     in-kernel preps; the next perf tier must target measured costs).
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

run bench_train_k4b 2700 python tools/bench_train.py --batch 8 --iters 4
run trace_pixdec 2700 python tools/trace_pixdec.py --iters 4 \
  --trace "$OUT/trace_pixdec"
run parse_pixdec 600 python tools/parse_trace.py "$OUT/trace_pixdec" \
  --iters 4 --top 40

echo "part B3 done $(date -u +%H:%M:%S)" | tee -a "$OUT/runbook.log"
