#!/usr/bin/env python
"""Discriminating experiment for the round-4 resume-loss discontinuity.

Round-4's on-chip soak (work_dirs/soak_w8, --cache-samples) restored
checkpoint 221 cleanly yet recomputed loss 65.6 where the pre-crash leg
logged 4.7 (VERDICT round-4 weak #2).  Three candidate causes:

  (H1) frozen-cache refill: with --cache-samples the loader freezes
       augmentation at the epoch of FIRST visit.  A restarted process
       refills the cache at the CURRENT epoch's augmentations, while the
       pre-crash model had overfit the previous leg's frozen samples —
       a jump on restart is then exactly what a CORRECT restore produces.
  (H2) fused channels-major LN on-chip numerics (DEFORM_LN=1 shipped
       without an on-chip numerics check until round 5).
  (H3) orbax restore infidelity.

This tool restores a soak checkpoint and recomputes the training loss on
sample caches filled at CHOSEN epochs, under both DEFORM_LN settings:

  python tools/resume_probe.py --out work_dirs/soak_w8 --fill-epochs 0 221 249

Readout:
  - loss varies strongly with fill epoch, matches the pre-crash logged
    level at the pre-crash leg's fill epoch            -> H1 (harness)
  - loss changes materially with DEFORM_LN             -> H2 (kernel)
  - loss high at EVERY fill epoch incl. the original   -> H3 (restore)

Reference counterpart: runner.resume semantics,
/root/reference/open_set/apis/train.py:234-244.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from betrayed_by_captions_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="work_dirs/soak_w8")
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=1024)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--fill-epochs", type=int, nargs="+", default=[0, 221, 249])
    ap.add_argument("--ln", choices=["both", "0", "1"], default="both",
                    help="DEFORM_LN settings to probe (both = A/B)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    args.cache_samples = True
    args.resume = True

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    ln_settings = ["1", "0"] if args.ln == "both" else [args.ln]
    results = []
    # DEFORM_LN is read at trace time inside the pixel decoder, and each
    # setting needs a fresh jit cache -> run each A/B leg in a subprocess
    if len(ln_settings) > 1 or os.environ.get("_RESUME_PROBE_CHILD") != "1":
        import subprocess

        for ln in ln_settings:
            env = dict(os.environ)
            env["DEFORM_LN"] = ln
            env["_RESUME_PROBE_CHILD"] = "1"
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--out", args.out, "--epochs", str(args.epochs),
                   "--batch", str(args.batch), "--hw", str(args.hw),
                   "--window", str(args.window), "--ln", ln,
                   "--fill-epochs"] + [str(e) for e in args.fill_epochs]
            if args.cpu:
                cmd.append("--cpu")
            proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
            sys.stderr.write(proc.stderr[-2000:])
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    results.append(json.loads(line))
                    print(line, flush=True)
            if proc.returncode != 0:
                print(f"probe child DEFORM_LN={ln} rc={proc.returncode}",
                      file=sys.stderr)
        with open(os.path.join(args.out, "resume_probe.json"), "w") as f:
            json.dump(results, f, indent=1)
        return

    _child(args)


def _child(args):
    import jax
    import jax.numpy as jnp

    import betrayed_by_captions_tpu.engine.train_loop as tl
    from betrayed_by_captions_tpu.engine.checkpoint import (
        latest_step,
        restore_checkpoint,
    )
    from betrayed_by_captions_tpu.engine.optim import (
        OptimizerConfig,
        build_optimizer,
    )
    from betrayed_by_captions_tpu.engine.train_state import create_train_state
    from betrayed_by_captions_tpu.engine.train_step import make_train_step
    from betrayed_by_captions_tpu.models import bert as bert_mod
    from betrayed_by_captions_tpu.models.bert import BertWordEmbeddings
    from betrayed_by_captions_tpu.models.detector import build_detector
    from betrayed_by_captions_tpu.parallel.mesh import create_mesh
    from betrayed_by_captions_tpu.parallel.multihost import make_global_batch
    from betrayed_by_captions_tpu.config import Config
    from betrayed_by_captions_tpu.data.loader import DataLoader

    from soak_train import build_soak_cfg

    cfg = build_soak_cfg(args)
    banks = tl.build_banks(cfg)
    model_cfg = dict(cfg.model)
    model_cfg.setdefault("num_classes", banks.num_base)
    model = build_detector(Config.fromdict(model_cfg))

    dataset = tl.build_dataset(cfg.data.train, train=True)
    local_batch = (
        cfg.data.get("samples_per_device", 2) * jax.local_device_count()
    )
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    sample_shape = (1,) + tuple(cfg.data.train.get("image_size", (1024, 1024))) + (3,)
    params = model.init(
        rng, jnp.zeros(sample_shape, jnp.float32), method="init_forward"
    )["params"]
    opt_cfg = OptimizerConfig(**cfg.get("optimizer", {}))
    if cfg.get("auto_scale_lr", True):
        import dataclasses as dc

        batch_size = cfg.data.get("samples_per_device", 2) * jax.device_count()
        opt_cfg = dc.replace(
            opt_cfg, lr=opt_cfg.lr * batch_size / cfg.get("base_batch_size", 16)
        )
    tx, _ = build_optimizer(params, opt_cfg)
    state = create_train_state(params, tx)

    ckpt_dir = os.path.join(args.out, "checkpoints")
    step = latest_step(ckpt_dir)
    assert step is not None, f"no checkpoint under {ckpt_dir}"
    state, step = restore_checkpoint(ckpt_dir, state)
    print(f"restored checkpoint epoch {step}", file=sys.stderr, flush=True)

    bert = BertWordEmbeddings(bert_mod.synthetic_bert_assets(800, 768))
    crit = tl.criterion_from_cfg(cfg, banks.num_base)
    mesh = create_mesh()
    step_fn = make_train_step(
        model, crit, banks.train_bank, bert, mesh=mesh, donate=False
    )

    ln = os.environ.get("DEFORM_LN", "1")
    with mesh:
        for fill_epoch in args.fill_epochs:
            # a FRESH loader per fill epoch: the cache memoizes the first
            # visit, which is exactly the restart behavior under test
            loader = DataLoader(
                dataset,
                batch_size=local_batch,
                num_workers=cfg.data.get("workers", 4),
                seed=cfg.get("seed", 0),
                cache_samples=True,
            )
            loader.set_epoch(fill_epoch)
            batch = next(iter(loader))
            device_batch = make_global_batch(batch, mesh)
            # rng convention matches train_loop: fold_in of global step
            step_rng = jax.random.fold_in(rng, step * len(loader))
            _, metrics = step_fn(state, device_batch, step_rng)
            loss = float(metrics["loss"])
            rec = {
                "ckpt_epoch": int(step),
                "fill_epoch": int(fill_epoch),
                "deform_ln": ln,
                "loss": round(loss, 4),
                "loss_components": {
                    k: round(float(v), 4)
                    for k, v in metrics.items()
                    if not k.startswith("d") and k != "loss"
                },
            }
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
