"""Checkpoint save/restore with rotation and auto-resume.

TPU-native equivalent of mmcv's CheckpointHook + runner.resume
(reference configs/instance/coco_b48n17.py:309-310: per-epoch, save_last,
max_keep_ckpts=2; open_set/apis/train.py:234-244): orbax checkpoints of
the full train state (params + optimizer state + step) plus a
weights-only load path for stage-2 initialization from stage-1
(init_cfg=Pretrained, coco_b48n17.py:14,187).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_keep: int = 2) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_keep, create=True
        ),
    )


def _leaf_checksums(tree) -> dict:
    """Per-leaf sha256 over raw bytes (host fetch included)."""
    import hashlib

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for keypath, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        arr = np.ascontiguousarray(np.asarray(leaf))
        out[name] = (
            str(arr.dtype),
            list(arr.shape),
            hashlib.sha256(arr.tobytes()).hexdigest(),
        )
    return out


def save_checkpoint(
    ckpt_dir: str,
    state,
    step: int,
    max_keep: int = 2,
    checksum: bool = False,
):
    """Save params/opt_state/step (TrainState sans the tx closure).

    ``checksum=True`` additionally records a per-leaf sha256 of the
    params next to the step dir; ``restore_checkpoint`` then asserts
    bit-exact restore fidelity on-chip (advisor round 4: the restore
    path had no on-hardware bit-exactness evidence, so a restore bug
    was indistinguishable from a training-harness artifact).  Costs one
    params device->host fetch per save — a soak/verification knob, not
    a default.
    """
    mgr = _manager(ckpt_dir, max_keep)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()
    if checksum:
        import json

        sums = _leaf_checksums(state.params)
        with open(
            os.path.join(ckpt_dir, f"checksums_{step}.json"), "w"
        ) as f:
            json.dump(sums, f)
        # rotate alongside orbax's max_to_keep
        kept = sorted(
            int(p.split("_")[1].split(".")[0])
            for p in os.listdir(ckpt_dir)
            if p.startswith("checksums_")
        )
        for old in kept[:-max_keep]:
            os.remove(os.path.join(ckpt_dir, f"checksums_{old}.json"))


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, state, step: Optional[int] = None):
    """Restore a full TrainState (auto-resume path). Returns new state."""
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        return state, 0
    # Topology note (advisor round 4): the abstract template carries no
    # sharding, so orbax falls back to the sharding recorded in the
    # checkpoint — correct when saving and restoring on the same
    # topology (this repo's train loop replicates params over the data
    # mesh, and single-chip == fully-replicated restores are
    # compatible); restoring onto a DIFFERENT device mesh should load
    # weights via save_params/load_params or pass an explicitly-sharded
    # template.
    # Abstract (shape, dtype) template rather than the live arrays:
    # orbax's StandardRestore type-checks template leaves and rejects
    # jax literal arrays (jax 0.9 TypedNdArray — constant-folded init
    # leaves like the deformable compass-init bias), which is exactly
    # what a freshly-inited TrainState can contain.  Restoring to
    # abstract leaves sidesteps the leaf type entirely and also skips a
    # pointless device round-trip of the template values.
    template = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            np.shape(x), getattr(x, "dtype", None) or np.asarray(x).dtype
        ),
        {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        },
    )
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    # restore-fidelity gate: when the save recorded per-leaf checksums,
    # demand the restored params reproduce them bit-for-bit
    sums_path = os.path.join(ckpt_dir, f"checksums_{step}.json")
    if os.path.exists(sums_path):
        import json

        with open(sums_path) as f:
            want = json.load(f)
        got = _leaf_checksums(restored["params"])
        bad = [
            k
            for k in want
            if k not in got or got[k][2] != want[k][2]
        ]
        missing = [k for k in got if k not in want]
        if bad or missing:
            raise RuntimeError(
                f"checkpoint restore infidelity at step {step}: "
                f"{len(bad)} mismatched leaves {bad[:5]}, "
                f"{len(missing)} unexpected leaves {missing[:5]}"
            )
        print(
            f"restore fidelity verified: {len(want)} param leaves "
            f"bit-exact at step {step}"
        )
    new_state = state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(restored["step"]),
    )
    return new_state, int(step)


def save_params(path: str, params):
    """Weights-only save (numpy .npz of the flattened tree)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for keypath, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        arrays[name] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_params(path: str, params_template):
    """Weights-only load into a matching param tree (stage-2 init)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    leaves = []
    for keypath, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        if name in data:
            arr = data[name]
            assert arr.shape == leaf.shape, f"{name}: {arr.shape} vs {leaf.shape}"
            leaves.append(arr.astype(leaf.dtype))
        else:
            leaves.append(leaf)  # missing keys keep their init (partial load)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params_template), leaves
    )
