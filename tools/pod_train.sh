#!/usr/bin/env bash
# Multi-host training launcher for TPU pod slices.
#
# TPU-native counterpart of the reference's tools/dist_train.sh /
# slurm_train.sh (/root/reference/tools/dist_train.sh:5-20): instead of
# torch.distributed.launch spawning one process per GPU, a pod slice runs
# ONE process per host and jax.distributed.initialize discovers peers
# from the TPU runtime metadata (no MASTER_ADDR plumbing needed on Cloud
# TPU). For non-TPU/multi-process CPU testing, set the JAX_* env vars
# explicitly (see parallel/multihost.py).
#
# Usage, on every host of the slice (e.g. via `gcloud compute tpus
# tpu-vm ssh --worker=all --command=...`):
#   bash tools/pod_train.sh <config> [extra tools/train.py args...]
set -euo pipefail

CONFIG=$1
shift || true

# jax.distributed.initialize() autodetects coordinator/process count on
# Cloud TPU; --distributed forces initialization even when the
# environment variables are pre-set (manual/CPU launches).
exec python "$(dirname "$0")/train.py" "$CONFIG" --distributed "$@"
