#!/usr/bin/env python
"""Deformable-window accuracy/speed study.

Round-1 mode (default flags): the synthetic OVERFIT harness
(data/synthetic.py) — train and eval on the same 8 images.

Round-3 mode (``--heldout-images N``): the GENERALIZATION harness
(VERDICT r2 item 3) — a disjoint held-out split is generated with a
different seed, and the reported mAP is on images the model never saw.
With ``--r-range lo hi`` scenes carry varied-size occluding instances,
so small/medium/large AP buckets are all populated and a receptive-field
deficit of small windows cannot hide behind memorization. The exact
unclamped path (``--with-exact``: window=None, attn_impl='exact')
anchors the reference semantics of mmcv's MultiScaleDeformableAttention
(/root/reference/configs/instance/coco_b48n17.py:48-58, unclamped
learned offsets). ``--gtds`` A/Bs the k-strided GT point sampling
(losses/criterion.py gt_point_downsample) on the same held-out signal.

Results feed the PERF.md window table; the flagship default is chosen on
this evidence.

Usage (the round-3 runbook invocation):
    python tools/window_study.py --windows 4 8 --with-exact --hw 512 \
        --epochs 25 --train-images 64 --heldout-images 16 --shapes 10 \
        --r-range 8 80 --batch 8 --queries 20 --max-instances 12 \
        --out work_dirs/wstudy512
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _parse_window(spec):
    """'8' -> 8; '8,6,4' -> (8, 6, 4) (per-value-level mixed window)."""
    if isinstance(spec, int) or spec is None:
        return spec
    parts = [int(x) for x in str(spec).split(",")]
    return parts[0] if len(parts) == 1 else tuple(parts)


def run_one(window, args, paths, val_paths, seed=0):
    import jax

    import betrayed_by_captions_tpu.engine.train_loop as tl
    from betrayed_by_captions_tpu.data.synthetic import tiny_overfit_config
    from betrayed_by_captions_tpu.engine import test_loop
    from betrayed_by_captions_tpu.models import bert as bert_mod

    if window is None:
        model_kw = dict(attn_impl="exact", deform_window=None)
        tag = "exact-unclamped"
    else:
        model_kw = dict(attn_impl=args.attn_impl, deform_window=window)
        wtag = (
            "x".join(str(x) for x in window)
            if isinstance(window, tuple)
            else str(window)
        )
        tag = f"W{wtag}-{args.attn_impl}"
    if args.gtds != 1:
        tag += f"-gtds{args.gtds}"
    if seed:
        tag += f"-s{seed}"

    cfg = tiny_overfit_config(
        paths, hw=(args.hw, args.hw), epochs=args.epochs, lr=args.lr,
        val_paths=val_paths, num_queries=args.queries,
        max_instances=args.max_instances, **model_kw
    )
    cfg["seed"] = seed  # model init + loader shuffle (train_loop)
    if args.cache_samples:
        # freeze per-epoch augmentation and memoize transformed samples
        # (data/loader.py): on a host whose CPU cannot re-augment at chip
        # rate (the 1-core TPU hosts), the study step drops to ~chip
        # time after epoch 1.  Protocol note: rows taken with the cache
        # are NOT comparable with live-augmentation rows — keep one
        # protocol per study output dir.
        cfg.data.cache_samples = True
    cfg.criterion.num_points = args.num_points
    cfg.criterion.gt_point_downsample = args.gtds
    cfg.data.samples_per_device = max(
        1, args.batch // jax.device_count()
    )  # global batch regardless of topology

    # tiny-vocab synthetic BERT (captions are off; the embedder is still
    # constructed by the loop)
    orig = bert_mod.load_bert_assets
    bert_mod.load_bert_assets = (
        lambda path=None, allow_synthetic=False: bert_mod.synthetic_bert_assets(
            200, 16
        )
    )
    tl.load_bert_assets = bert_mod.load_bert_assets
    work = os.path.join(args.out, tag)
    t0 = time.time()
    try:
        # resume=True: a fresh run starts from scratch (no checkpoint
        # yet), but a watchdog restart after a tunnel wedge picks the
        # run up at its last saved epoch instead of retraining (work
        # dirs are unique per (impl, seed) tag)
        state = tl.train(cfg, work, resume=True)
    finally:
        bert_mod.load_bert_assets = orig
        tl.load_bert_assets = orig
    train_time = time.time() - t0

    losses = []
    with open(os.path.join(work, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                losses.append(rec["loss"])

    row = {
        "tag": tag,
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "loss_drop_x": (losses[0] / losses[-1]) if losses else None,
        "steps": len(losses) * 1,  # log_interval=1
        "sec_per_step": train_time / max(
            1, args.epochs * max(1, args.train_images // args.batch)
        ),
    }
    metrics = test_loop.evaluate(cfg, state.params)
    prefix = "heldout" if val_paths is not None else "overfit"
    for k in ("mAP", "mAP_50", "mAP_s", "mAP_m", "mAP_l"):
        row[f"{prefix}_segm_{k}"] = metrics.get(f"all_results.segm.{k}")
    row[f"{prefix}_bbox_mAP"] = metrics.get("all_results.bbox.mAP")
    row["segm_mAP"] = metrics.get("all_results.segm.mAP")  # legacy key
    if val_paths is not None and args.eval_train:
        # train-split eval distinguishes "can't fit" from "can't generalize"
        cfg_train = tiny_overfit_config(
            paths, hw=(args.hw, args.hw), epochs=args.epochs, lr=args.lr,
            num_queries=args.queries, max_instances=args.max_instances,
            **model_kw
        )
        m2 = test_loop.evaluate(cfg_train, state.params)
        row["train_segm_mAP"] = m2.get("all_results.segm.mAP")
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=_parse_window, nargs="+",
                    default=[4, 6, 8],
                    help="ints or comma tuples ('8,6,4' = per-value-level "
                    "mixed window)")
    ap.add_argument("--seeds", type=int, default=1,
                    help="repeat each impl with seeds 0..N-1 (same data; "
                    "model init + shuffle vary) and report mean/sd")
    ap.add_argument("--with-exact", action="store_true",
                    help="also run the unclamped exact reference path")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--attn-impl", default="windowed_pallas")
    ap.add_argument("--out", default="work_dirs/window_study")
    # 128^2 default: at 64^2 the encoder levels are (2,2)/(4,4)/(8,8) and
    # every window covers nearly the whole level, which would trivially
    # hide window-size effects
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--train-images", type=int, default=8)
    ap.add_argument("--heldout-images", type=int, default=0,
                    help="size of a disjoint (seed-offset) eval split; "
                    "0 = eval on the training images (overfit mode)")
    ap.add_argument("--shapes", type=int, default=2,
                    help="instances per image")
    ap.add_argument("--r-range", type=int, nargs=2, default=None,
                    help="varied instance radii + random occluding "
                    "placement (see data/synthetic.py)")
    ap.add_argument("--batch", type=int, default=8, help="global batch")
    ap.add_argument("--queries", type=int, default=8)
    ap.add_argument("--max-instances", type=int, default=4)
    ap.add_argument("--num-points", type=int, default=256,
                    help="criterion mask-loss sample points")
    ap.add_argument("--cache-samples", action="store_true",
                    help="freeze augmentation + memoize transformed "
                    "samples (loader cache_samples): ~chip-rate steps "
                    "on 1-core hosts; do not mix with live-aug rows")
    ap.add_argument("--gtds", type=int, default=1,
                    help="criterion gt_point_downsample (k-strided GT "
                    "sampling; flagship configs ship k=4)")
    ap.add_argument("--no-eval-train", dest="eval_train",
                    action="store_false",
                    help="skip the extra train-split eval in held-out mode")
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (must be set via the config API: the "
        "axon sitecustomize pre-imports jax, so JAX_PLATFORMS is ignored)",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from betrayed_by_captions_tpu.data.synthetic import write_synthetic_coco

    gen_kw = dict(
        hw=(args.hw, args.hw), n_classes=2, emb_dim=16,
        shapes_per_image=args.shapes,
        r_range=tuple(args.r_range) if args.r_range else None,
    )
    paths = write_synthetic_coco(
        os.path.join(args.out, "data"), n_images=args.train_images, **gen_kw
    )
    val_paths = None
    if args.heldout_images:
        val_paths = write_synthetic_coco(
            os.path.join(args.out, "data_heldout"),
            n_images=args.heldout_images, seed=1000, **gen_kw
        )

    rows = []
    runs = ([None] if args.with_exact else []) + list(args.windows)
    out_json = os.path.join(args.out, "window_study.json")
    if os.path.exists(out_json):  # resume an interrupted sweep (the
        # tunnel can wedge mid-run; completed rows are already on disk)
        with open(out_json) as f:
            rows = json.load(f)
        print(f"resuming: {len(rows)} completed rows", flush=True)
    done = {(r["tag"], r.get("seed", 0)) for r in rows}

    def tag_of(wdw, seed):
        if wdw is None:
            t = "exact-unclamped"
        else:
            wtag = (
                "x".join(str(x) for x in wdw)
                if isinstance(wdw, tuple)
                else str(wdw)
            )
            t = f"W{wtag}-{args.attn_impl}"
        if args.gtds != 1:
            t += f"-gtds{args.gtds}"
        if seed:
            t += f"-s{seed}"
        return t

    for seed in range(args.seeds):
        for wdw in runs:
            if (tag_of(wdw, seed), seed) in done:
                continue
            try:
                r = run_one(wdw, args, paths, val_paths, seed=seed)
            except Exception as e:  # one broken impl must not kill the
                # whole multi-hour sweep (e.g. a Mosaic lowering reject)
                print(f"RUN FAILED window={wdw} seed={seed}: "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)
                continue
            r["seed"] = seed
            rows.append(r)
            print(json.dumps(r), flush=True)
            with open(out_json, "w") as f:  # incremental: runs are long
                json.dump(rows, f, indent=1)
    prefix = "heldout" if val_paths is not None else "overfit"

    if args.seeds > 1:
        # mean +- sd per impl (strip the -sN suffix)
        import numpy as np

        by_impl = {}
        for r in rows:
            base = r["tag"].split("-s")[0]
            by_impl.setdefault(base, []).append(r)
        print(f"\n| impl | {prefix} segm mAP (mean+-sd over "
              f"{args.seeds} seeds) | mAP_50 | mAP_m |")
        print("|---|---|---|---|")
        for base, rs in by_impl.items():
            def ms(key):
                vals = [
                    r[key] for r in rs if r.get(key) is not None
                ]
                return (
                    f"{np.mean(vals):.3f}+-{np.std(vals):.3f}"
                    if vals
                    else "n/a"
                )

            print(
                f"| {base} | {ms(f'{prefix}_segm_mAP')} "
                f"| {ms(f'{prefix}_segm_mAP_50')} "
                f"| {ms(f'{prefix}_segm_mAP_m')} |"
            )
    print(f"\n| window | loss first -> last | drop | {prefix} segm mAP "
          "| mAP_s | s/step |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['tag']} | {r['loss_first']:.2f} -> {r['loss_last']:.2f} "
            f"| {r['loss_drop_x']:.1f}x | {r[f'{prefix}_segm_mAP']} "
            f"| {r.get(f'{prefix}_segm_mAP_s')} "
            f"| {r['sec_per_step']:.2f} |"
        )


if __name__ == "__main__":
    main()
