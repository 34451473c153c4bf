#!/usr/bin/env python
"""Sustained flagship-shape training soak (VERDICT round-2 item 5).

Runs a multi-hundred-step training run at the reference training
resolution (1024x1024 LSJ crops, batch 8 — the shipped finetune config
shape, /root/reference/configs/instance/coco_b48n17.py:195-218) through
the REAL train loop (epochs, checkpoint rotation, auto-resume) on a tiny
synthetic dataset, and verifies what a single bench iteration cannot:

- step-time stability (p50 vs p90 over the run, excluding compile),
- no HBM creep (device bytes_in_use sampled every epoch),
- finite, decreasing loss over a real LR schedule,
- checkpoint + auto-resume mid-run: call once with --epochs 250, then
  again with --epochs 500 --resume; the second run must restore at 250.

Usage:
    python tools/soak_train.py --epochs 250 --out work_dirs/soak
    python tools/soak_train.py --epochs 500 --resume --out work_dirs/soak
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from betrayed_by_captions_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def build_soak_cfg(args):
    """The soak's full config from parsed args — shared with
    tools/resume_probe.py, which must reconstruct the EXACT training
    setup (model, optimizer tree, data, criterion) to recompute losses
    against a soak checkpoint."""
    import jax

    from betrayed_by_captions_tpu.data.synthetic import (
        tiny_overfit_config,
        write_synthetic_coco,
    )

    hw = 64 if args.cpu else args.hw
    paths = write_synthetic_coco(
        os.path.join(args.out, "data"), n_images=args.batch,
        hw=(hw, hw), n_classes=2, emb_dim=768, shapes_per_image=4,
        r_range=(hw // 16, hw // 4),  # r_range scenes occlude (synthetic.py)
    )
    # flagship model shape (detector defaults: R50, 100 queries, 9 decoder
    # layers, feat 256, emb 768) on the shipped training knobs
    cfg = tiny_overfit_config(
        paths,
        hw=(hw, hw),
        emb_dim=768,
        epochs=args.epochs,
        lr=1e-4,
        num_queries=100,
        feat_channels=256,
        num_decoder_layers=9,
        attn_impl="windowed_pallas",
        deform_window=args.window,
        remat=True,
        dtype="bfloat16",
    )
    cfg.data.samples_per_device = max(1, args.batch // jax.device_count())
    cfg.data.train.max_instances = 8
    # Round 3 measured 17-22 s of GIL-bound thread-pool data_time against
    # a ~5 s chip step; the forked process workers (data/loader.py) are
    # expected to hide augmentation behind the chip even on this box.
    # --cache-samples remains as the fallback knob for hosts that still
    # cannot keep up (it freezes augmentation; chip math unchanged).
    cfg.data.cache_samples = bool(args.cache_samples)
    cfg.criterion.num_points = 12544
    cfg.criterion.gt_point_downsample = 4
    cfg.optimizer.frozen_backbone_stages = 3  # finetune-config convention
    # soak legs verify restore fidelity bit-exactly (per-leaf sha256 at
    # save, asserted at restore) — the round-4 resume-loss discontinuity
    # was undiagnosable without it (advisor round-4 medium)
    cfg.checkpoint_checksum = True
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=500,
                    help="with 8 images and global batch 8, 1 step/epoch")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=1024)
    ap.add_argument("--out", default="work_dirs/soak")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--cache-samples", action="store_true",
                    help="freeze augmentation after first visit (loader "
                    "cache) — only for hosts whose cores cannot re-augment "
                    "batch x hw^2 images per step; the default relies on "
                    "the forked process workers (round-4 loader)")
    ap.add_argument("--cpu", action="store_true",
                    help="tiny CPU smoke (forces hw=64 shapes)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    import betrayed_by_captions_tpu.engine.train_loop as tl
    from betrayed_by_captions_tpu.models import bert as bert_mod

    cfg = build_soak_cfg(args)
    # Pin the LR schedule across resume legs: the schedule is a function
    # of global_step and lr_steps, so re-deriving lr_steps from THIS
    # leg's --epochs would silently train a resumed leg on a different
    # schedule than the pre-crash leg (round-4 reresume trained at the
    # post-decay lr because its recomputed step landed past the new
    # boundary).  First leg persists the schedule; later legs reuse it.
    sched_path = os.path.join(args.out, "soak_schedule.json")
    if args.resume and os.path.exists(sched_path):
        with open(sched_path) as f:
            sched = json.load(f)
        cfg.optimizer.lr_steps = tuple(sched["lr_steps"])
        print(f"soak: pinned LR schedule from first leg: {sched}",
              file=sys.stderr)
    else:
        cfg.optimizer.lr_steps = (int(args.epochs * 0.9),)
        os.makedirs(args.out, exist_ok=True)
        with open(sched_path, "w") as f:
            json.dump({"epochs": args.epochs,
                       "lr_steps": list(cfg.optimizer.lr_steps)}, f)
    # log_interval=1 (tiny_overfit_config): every metrics.jsonl record
    # carries a per-step synced "time"; sample HBM watermarks per epoch
    cfg.log_device_memory = True

    orig = bert_mod.load_bert_assets
    bert_mod.load_bert_assets = (
        lambda path=None, allow_synthetic=False: bert_mod.synthetic_bert_assets(
            800, 768
        )
    )
    tl.load_bert_assets = bert_mod.load_bert_assets

    t0 = time.time()
    try:
        state = tl.train(cfg, args.out, resume=args.resume)
    finally:
        bert_mod.load_bert_assets = orig
        tl.load_bert_assets = orig
    wall = time.time() - t0

    d = jax.local_devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)() or {}
    report, ok = analyze_soak(args.out, args.batch, wall=wall, stats=stats)
    print(json.dumps(report))
    with open(os.path.join(args.out, "soak_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("SOAK OK" if ok else "SOAK FAIL", file=sys.stderr)
    sys.exit(0 if ok else 1)


def analyze_soak(out_dir, batch, wall=0.0, stats=None):
    """Analyze a finished run's metrics.jsonl + hbm.jsonl (unit-testable:
    tests/test_tools.py builds the logs synthetically). Returns (report,
    ok); ok demands finite decreasing loss, p90/p50 step time < 1.5, and
    steady-state HBM growth < 2%."""
    import numpy as np

    stats = stats or {}
    losses, times, dtimes = [], [], []
    # per-LEG warmup exclusion: each (re)start's first steps pay
    # restore + compile + cache refill (round-5 mini-soak: 224-510 s
    # restart steps vs a 42 s steady state); train_loop writes a
    # train_start event at every leg boundary, and the first
    # WARMUP_STEPS after each are excluded from the stability stats —
    # the old file-head-only exclusion misread restart cost as jitter.
    WARMUP_STEPS = 3
    warm_left = WARMUP_STEPS  # the file head is leg 0's start
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("event") == "train_start":
                warm_left = WARMUP_STEPS
                continue
            if "loss" in rec:
                losses.append(float(rec["loss"]))
            if "time" in rec:  # per-step synced wall time (log_interval=1)
                if warm_left > 0:
                    warm_left -= 1
                else:
                    times.append(float(rec["time"]))
            if "data_time" in rec and warm_left == 0:
                dtimes.append(float(rec["data_time"]))

    # HBM creep: steady-state bytes_in_use must not grow epoch over epoch.
    # bytes_in_use comes from the device allocator when available; via the
    # axon tunnel it is null, so live_buffer_bytes (client-side live
    # device-array total — the series a reference leak moves) is the
    # fallback.  A series with NO usable values fails the soak: dead
    # telemetry must not pass silently (round-3 verdict).
    hbm_first = hbm_last = None
    hbm_dead = False
    hbm_path = os.path.join(out_dir, "hbm.jsonl")
    if os.path.exists(hbm_path):
        with open(hbm_path) as f:
            recs = [json.loads(x) for x in f if x.strip()]
        vals = [
            r.get("bytes_in_use") or r.get("live_buffer_bytes")
            for r in recs
        ]
        vals = [v for v in vals if v]
        if len(vals) >= 5:
            # skip the first 2 epochs (allocator warmup)
            hbm_first, hbm_last = vals[2], vals[-1]
        elif len(recs) >= 5:
            hbm_dead = True

    # per-leg warmup is already excluded above
    steady = sorted(times)
    p50 = steady[len(steady) // 2] if steady else float("nan")
    p90 = steady[int(len(steady) * 0.9)] if steady else float("nan")
    dsteady = sorted(dtimes)
    d50 = dsteady[len(dsteady) // 2] if dsteady else None
    d90 = dsteady[int(len(dsteady) * 0.9)] if dsteady else None
    first = float(np.mean(losses[:5])) if losses else float("nan")
    last = float(np.mean(losses[-5:])) if losses else float("nan")

    report = {
        "steps": len(losses),
        "wall_s": round(wall, 1),
        "loss_first5": round(first, 3),
        "loss_last5": round(last, 3),
        "loss_finite": bool(np.isfinite(losses).all()) if losses else False,
        "step_p50_s": round(p50, 3),
        "step_p90_s": round(p90, 3),
        "step_p90_over_p50": round(p90 / p50, 3) if steady else None,
        # data_time = host batch production stalls visible to the step
        # loop (prefetch hides worker time; VERDICT r3 item 6 wants this
        # below compute without the augmentation-freezing cache)
        "data_p50_s": round(d50, 3) if d50 is not None else None,
        "data_p90_s": round(d90, 3) if d90 is not None else None,
        "img_per_s_chip": round(batch / p50, 2) if steady else None,
        "hbm_bytes_in_use": stats.get("bytes_in_use"),
        "hbm_peak_bytes": stats.get("peak_bytes_in_use"),
        "hbm_epoch3_bytes": hbm_first,
        "hbm_last_epoch_bytes": hbm_last,
        "hbm_creep": (
            round(hbm_last / hbm_first - 1, 4) if hbm_first else None
        ),
        "hbm_telemetry_dead": hbm_dead,
    }
    ok = (
        report["loss_finite"]
        and last < first
        and (report["step_p90_over_p50"] or 10) < 1.5
        and (report["hbm_creep"] is None or report["hbm_creep"] < 0.02)
        and not hbm_dead
    )
    return report, ok


if __name__ == "__main__":
    main()
