"""Config-driven training loop.

TPU-native replacement for the reference's ``train_detector`` + mmcv
EpochBasedRunner/hooks (open_set/apis/train.py:117-244): builds datasets,
the model, the optimizer and ONE pjit-compiled train step, then runs
epochs with logging, per-epoch checkpointing (rotation), auto-resume, and
interval evaluation. LR scaling vs the base batch 16 follows the
reference's auto_scale_lr semantics (apis/train.py:71-114).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..losses.criterion import CriterionConfig
from ..models.bert import BertWordEmbeddings, load_bert_assets
from ..models.class_banks import asset_path, load_class_banks
from ..models.detector import build_detector
from ..parallel.mesh import create_mesh
from ..parallel.multihost import make_global_batch
from ..utils.logging import MetricLogger
from .checkpoint import (
    latest_step,
    load_params,
    restore_checkpoint,
    save_checkpoint,
)
from .optim import OptimizerConfig, build_optimizer
from .train_state import create_train_state
from .train_step import make_train_step


def build_banks(cfg: Config):
    a = cfg.get("assets", {})
    return load_class_banks(
        a.get("class_to_emb_file") or asset_path("embeddings", "coco_class_with_bert_emb.json"),
        known_file=a.get("known_file"),
        unknown_file=a.get("unknown_file"),
    )


def build_dataset(data_cfg: Config, train: bool = True):
    from ..data.coco import CocoDatasetOpen
    from ..data.coco_panoptic import CocoPanopticDatasetOpen
    from ..data.loader import ClassBalancedDataset
    from ..data.transforms import TrainTransform

    kind = data_cfg.get("type", "CocoDatasetOpen")
    kwargs = {
        k: v
        for k, v in data_cfg.items()
        if k not in ("type", "class_balanced", "oversample_thr", "image_size",
                     "max_instances", "test_scale", "test_pad_bucket")
    }
    if train:
        kwargs["train_transform"] = TrainTransform(
            image_size=tuple(data_cfg.get("image_size", (1024, 1024))),
            max_instances=data_cfg.get("max_instances", 100),
        )
    elif "test_scale" in data_cfg or "test_pad_bucket" in data_cfg:
        from ..data.transforms import TestTransform

        kwargs["test_transform"] = TestTransform(
            scale=tuple(data_cfg.get("test_scale", (1333, 800))),
            pad_bucket=tuple(data_cfg.get("test_pad_bucket", (800, 1344))),
        )
    cls = {
        "CocoDatasetOpen": CocoDatasetOpen,
        "CocoPanopticDatasetOpen": CocoPanopticDatasetOpen,
    }[kind]
    ds = cls(**kwargs)
    if train and data_cfg.get("class_balanced", False):
        ds = ClassBalancedDataset(ds, data_cfg.get("oversample_thr", 1e-3))
    return ds


def criterion_from_cfg(cfg: Config, num_classes: int) -> CriterionConfig:
    c = cfg.get("criterion", {})
    return CriterionConfig(num_classes=num_classes, **c)


def train(cfg: Config, work_dir: str, resume: bool = False):
    from ..data.loader import DataLoader

    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "config.py"), "w") as f:
        f.write(cfg.dump())

    banks = build_banks(cfg)
    model_cfg = dict(cfg.model)
    model_cfg.setdefault("num_classes", banks.num_base)
    model = build_detector(Config.fromdict(model_cfg))

    dataset = build_dataset(cfg.data.train, train=True)
    # global batch defines the math (LR scaling, grounding BxB); each
    # process loads only its local share (samples_per_device x local devs)
    batch_size = cfg.data.get("samples_per_device", 2) * jax.device_count()
    local_batch = (
        cfg.data.get("samples_per_device", 2) * jax.local_device_count()
    )
    loader = DataLoader(
        dataset,
        batch_size=local_batch,
        num_workers=cfg.data.get("workers", 4),
        seed=cfg.get("seed", 0),
        cache_samples=cfg.data.get("cache_samples", False),
    )

    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    sample_shape = (1,) + tuple(cfg.data.train.get("image_size", (1024, 1024))) + (3,)
    params = model.init(
        rng, jnp.zeros(sample_shape, jnp.float32), method="init_forward"
    )["params"]

    # stage-2 init from a pretrained stage (reference init_cfg=Pretrained)
    if cfg.get("init_from"):
        params = load_params(cfg.init_from, params)
        print(f"initialized params from {cfg.init_from}")

    opt_cfg = OptimizerConfig(**cfg.get("optimizer", {}))
    # linear LR scaling vs base total batch 16
    if cfg.get("auto_scale_lr", True):
        import dataclasses as dc

        scale = batch_size / cfg.get("base_batch_size", 16)
        opt_cfg = dc.replace(opt_cfg, lr=opt_cfg.lr * scale)
    tx, schedule = build_optimizer(params, opt_cfg)
    state = create_train_state(params, tx)

    # the train state owns the params from here on; drop the init-tree
    # reference so a RESUMED run does not pin the (replaced) freshly-
    # initialized tree in HBM for the whole run (round-5 mini-soak: a
    # flat per-leg live-buffer series with a +179 MB level shift on the
    # restarted leg — exactly this tree)
    del params

    ckpt_dir = os.path.join(work_dir, "checkpoints")
    start_epoch = 0
    if resume and latest_step(ckpt_dir) is not None:
        state, step = restore_checkpoint(ckpt_dir, state)
        start_epoch = step
        print(f"resumed from epoch {step}")

    bert = BertWordEmbeddings(
        load_bert_assets(
            cfg.get("bert_assets"),
            allow_synthetic=cfg.get("allow_synthetic_bert", False),
        )
    )
    crit = criterion_from_cfg(cfg, banks.num_base)
    mesh = create_mesh()
    # explicit-SPMD data parallelism (shard_map): matching stays
    # device-local, grounding all_gathers, one psum for gradients
    step_fn = make_train_step(
        model, crit, banks.train_bank, bert, mesh=mesh
    )
    logger = MetricLogger(
        work_dir,
        interval=cfg.get("log_interval", 50),
        tensorboard=cfg.get("tensorboard", False),
    )
    max_epochs = cfg.get("max_epochs", 12)
    global_step = start_epoch * len(loader)
    best_score = float("-inf")
    # leg boundary marker: each (re)start's first steps pay restore +
    # compile + cache fill; analyses exclude per-leg warmup by these
    logger.log_event(
        {"event": "train_start", "start_epoch": int(start_epoch)}
    )

    with mesh:
        for epoch in range(start_epoch, max_epochs):
            loader.set_epoch(epoch)
            for batch in loader:
                logger.data_tick()
                device_batch = make_global_batch(batch, mesh)
                # stateless per-step rng (fold_in of the global step, not
                # a sequential split): a resumed run consumes the SAME
                # randomness stream as a continuous one, so save/restore
                # is loss-trajectory-exact (tests/test_resume_continuity)
                step_rng = jax.random.fold_in(rng, global_step)
                state, metrics = step_fn(state, device_batch, step_rng)
                global_step += 1
                logger.log_step(
                    global_step,
                    {k: v for k, v in metrics.items() if not k.startswith("d")},
                    lr=schedule(global_step),  # lazy: logger syncs at flush
                )
            save_checkpoint(
                ckpt_dir, state, epoch + 1, cfg.get("max_keep_ckpts", 2),
                checksum=cfg.get("checkpoint_checksum", False),
            )
            print(f"epoch {epoch + 1}/{max_epochs} done; checkpoint saved")

            # per-epoch device-memory watermarks (HBM-creep detection for
            # sustained runs; tools/soak_train.py asserts on this file)
            if cfg.get("log_device_memory", False):
                import json

                dev = jax.local_devices()[0]
                stats = getattr(dev, "memory_stats", lambda: None)() or {}
                # allocator telemetry is unavailable through the axon
                # tunnel (round-3 soak recorded 89 lines of nulls) — fall
                # back to the client-side live-buffer total, which is the
                # series a device-reference leak actually moves
                live = sum(
                    x.nbytes
                    for x in jax.live_arrays()
                    if dev in getattr(x, "devices", lambda: ())()
                )
                with open(os.path.join(work_dir, "hbm.jsonl"), "a") as f:
                    f.write(
                        json.dumps(
                            {
                                "epoch": epoch + 1,
                                "bytes_in_use": stats.get("bytes_in_use"),
                                "peak_bytes_in_use": stats.get(
                                    "peak_bytes_in_use"
                                ),
                                "live_buffer_bytes": int(live),
                            }
                        )
                        + "\n"
                    )

            # dynamic intervals (reference EvalHook dynamic_intervals,
            # apis/eval_hooks.py:24-55): list of (start_epoch, interval)
            # milestones; the latest reached milestone wins
            eval_interval = cfg.get("eval_interval", max_epochs)
            for start, interval in cfg.get("eval_dynamic_intervals", ()):
                if (epoch + 1) >= start:
                    eval_interval = interval
            if (epoch + 1) % eval_interval == 0 and cfg.data.get("val"):
                from .test_loop import evaluate as run_eval

                metrics = run_eval(cfg, state.params, work_dir=work_dir)
                print(f"eval @ epoch {epoch + 1}: {metrics}")

                # save-best hook (reference apis/eval_hooks.py:56-75):
                # track cfg.save_best (a metric key) and keep the best
                # epoch's weights under checkpoints/best.npz
                best_key = cfg.get("save_best")
                if best_key and best_key in metrics:
                    from .checkpoint import save_params

                    cur = float(metrics[best_key])
                    if cur > best_score:
                        best_score = cur
                        save_params(
                            os.path.join(ckpt_dir, "best.npz"), state.params
                        )
                        with open(
                            os.path.join(ckpt_dir, "best.json"), "w"
                        ) as f:
                            import json

                            json.dump(
                                {"epoch": epoch + 1, best_key: cur}, f
                            )
                        print(
                            f"new best {best_key}={cur:.4f} "
                            f"@ epoch {epoch + 1}"
                        )

    loader.close()  # terminate the persistent worker pool

    # final weights export: the file stage-2 configs init_from
    # (e.g. work_dirs/coco_ag_pretrain_3x/params.npz) and tools/test.py
    # consume — without it the two-stage recipe needs a manual export
    from .checkpoint import save_params

    save_params(os.path.join(work_dir, "params.npz"), state.params)
    return state
