#!/usr/bin/env bash
# Round-4 phase A: warm bench verify + mixed-window A/B + batch sweep.
# Runs the chip jobs back-to-back so tunnel-compile gaps aren't wasted
# on human-in-the-loop latency. Each bench invocation prints one JSON
# line; logs land in work_dirs/r4_tpu/.
set -u
cd "$(dirname "$0")/.."
OUT=work_dirs/r4_tpu
mkdir -p "$OUT"

echo "=== phase A start $(date -u +%H:%M:%S)"
# 1) warm verify at shipped defaults (compile cached by the cold run)
timeout 1200 python bench.py > "$OUT/bench_warm.log" 2>&1
echo "warm rc=$? $(tail -1 "$OUT/bench_warm.log")"

# 2) batch sweep at W=8 (batch 16 was tuned at W=4 — VERDICT r3 item 9).
#    Runs before the mixed-window A/B: a better batch is an UNGATED
#    default change (pure throughput tuning), so it can move the
#    official round-end bench, while mixed windows await the accuracy
#    study.
timeout 2400 env BENCH_BATCH=24 python bench.py > "$OUT/bench_b24.log" 2>&1
echo "b24 rc=$? $(tail -1 "$OUT/bench_b24.log")"

# 3) mixed per-level windows W=(8,6,4) A/B (gated feature; kernel-side
#    1.36x on the stride-8 launch, PERF.md round-10)
timeout 2400 env BENCH_WINDOW=8,6,4 python bench.py > "$OUT/bench_w864.log" 2>&1
echo "w864 rc=$? $(tail -1 "$OUT/bench_w864.log")"

echo "=== phase A done $(date -u +%H:%M:%S)"
