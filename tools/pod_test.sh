#!/usr/bin/env bash
# Multi-host evaluation launcher for TPU pod slices.
#
# TPU-native counterpart of the reference's tools/dist_test.sh /
# slurm_test.sh: one process per host; each process evaluates a strided
# shard of the val set and results are collected through the shared
# filesystem (parallel/multihost.collect_results_cpu — the reference's
# collect_results_cpu pickle/tmpdir protocol, open_set/apis/test.py:133-175).
#
# Usage, on every host of the slice:
#   bash tools/pod_test.sh <config> <checkpoint> [extra tools/test.py args...]
set -euo pipefail

CONFIG=$1
CKPT=$2
shift 2 || true

exec python "$(dirname "$0")/test.py" "$CONFIG" "$CKPT" --distributed "$@"
