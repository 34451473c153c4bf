"""Multi-host (multi-process) execution utilities.

TPU-native equivalent of the reference's distributed launch + result
collection (tools/dist_train.sh:5-20, open_set/apis/train.py:151-163,
open_set/apis/test.py:133-175). A v5e pod slice runs one process per
host; JAX gives every process the same SPMD program over the global
device mesh, so the only host-side work is:

- ``maybe_initialize_distributed``: call ``jax.distributed.initialize``
  when launched multi-process (coordinator env vars present),
- per-process data sharding (``DataLoader(process_count, process_index)``
  — each process loads only its slice of the dataset),
- ``make_global_batch``: assemble per-process local batches into global
  jax.Arrays sharded over the ``data`` mesh axis,
- ``collect_results_cpu``: eval-result gathering through the shared
  filesystem (the reference's pickle/tmpdir collector), with a global
  device barrier standing in for dist.barrier.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def maybe_initialize_distributed(force: bool = False) -> tuple:
    """Initialize jax.distributed when launched multi-process.

    Triggered by the standard coordinator env vars (set by the launcher)
    or ``force``. Safe no-op for single-process runs. Returns
    (process_index, process_count)."""
    if force or (
        os.environ.get("COORDINATOR_ADDRESS")
        and os.environ.get("NUM_PROCESSES")
    ):
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def make_global_batch(batch: Dict[str, Any], mesh, axis_name: str = "data"):
    """Per-process local batch -> global batch-sharded jax.Arrays.

    Single-process: plain device_put with batch sharding. Multi-process:
    each process contributes its local shard of the global batch
    (``jax.make_array_from_process_local_data``)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def collect_results_cpu(
    work_dir: str,
    local_results: Dict[int, Any],
    total: int,
    tag: str = "eval",
) -> Optional[List[Any]]:
    """Gather per-image results across processes through the shared
    filesystem (reference collect_results_cpu, apis/test.py:133-175).

    Args:
        local_results: original-dataset-index -> result for the images
            this process evaluated.
        total: global number of images.

    Returns the ordered result list on process 0, None elsewhere."""
    pid, pcount = jax.process_index(), jax.process_count()
    if pcount == 1:
        return [local_results[i] for i in range(total)]

    from jax.experimental import multihost_utils

    part_dir = os.path.join(work_dir, f".{tag}_parts")
    os.makedirs(part_dir, exist_ok=True)
    with open(os.path.join(part_dir, f"part_{pid}.pkl"), "wb") as f:
        pickle.dump(local_results, f)
    multihost_utils.sync_global_devices(f"{tag}_collect_write")

    if pid != 0:
        multihost_utils.sync_global_devices(f"{tag}_collect_read")
        return None

    merged: Dict[int, Any] = {}
    for p in range(pcount):
        with open(os.path.join(part_dir, f"part_{p}.pkl"), "rb") as f:
            merged.update(pickle.load(f))
    multihost_utils.sync_global_devices(f"{tag}_collect_read")
    assert len(merged) == total, (len(merged), total)
    return [merged[i] for i in range(total)]
