"""Device mesh + sharding rules.

TPU-native replacement for the reference's NCCL/DDP distribution
(SURVEY.md §2c): the reference implements exactly one strategy — data
parallelism with a cross-rank all_gather in the grounding loss
(open_set/apis/train.py:156-161, mask2former_head.py:650-684). Here that
becomes a 1-D ``data`` mesh with batch-dim NamedSharding on inputs and
replicated parameters. The train step runs explicit SPMD under
``jax.shard_map`` over this mesh (engine/train_step.py): matching and
per-image losses stay device-local, the grounding loss all_gathers over
the axis, normalizers are psum'd, and the gradient reduction is a single
psum over ICI.

The mesh is built 1-D over all devices by default; callers can pass an
explicit device list (e.g. a virtual CPU mesh in tests / dryruns).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices: Optional[Sequence[Any]] = None, axis_name: str = "data"
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch dict onto the mesh, batch-dim sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
