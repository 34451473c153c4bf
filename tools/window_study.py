#!/usr/bin/env python
"""Deformable-window accuracy/speed study (VERDICT round-1 item 2).

Trains the synthetic overfit harness (data/synthetic.py) at several
``deform_window`` settings with the production ``windowed_pallas`` path
and reports, per window: the train-loss trajectory (first/last), the
overfit eval AP on the training images, and the measured per-step time.
The exact unclamped path (window=None, attn_impl='exact') anchors the
reference semantics.

Run on TPU (windows compile the fused kernel) or CPU (interpret mode,
slow). Results feed the PERF.md window table; the flagship default is
chosen on this evidence.

Usage:
    python tools/window_study.py [--windows 4 6 8] [--epochs 60]
        [--out work_dirs/window_study]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_one(window, args, paths):
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
        tag = f"W{window}-{args.attn_impl}"

    cfg = tiny_overfit_config(
        paths, hw=(args.hw, args.hw), epochs=args.epochs, lr=args.lr,
        **model_kw
    )
    cfg.data.samples_per_device = max(
        1, 8 // jax.device_count()
    )  # global batch 8 regardless of topology

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
        state = tl.train(cfg, work, resume=False)
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
    metrics = test_loop.evaluate(cfg, state.params)
    return {
        "tag": tag,
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "loss_drop_x": (losses[0] / losses[-1]) if losses else None,
        "segm_mAP": metrics.get("all_results.segm.mAP"),
        "bbox_mAP": metrics.get("all_results.bbox.mAP"),
        "steps": len(losses) * 1,  # log_interval=1
        "sec_per_step": train_time / max(1, args.epochs),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, nargs="+", default=[4, 6, 8])
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

    paths = write_synthetic_coco(
        os.path.join(args.out, "data"), n_images=8, hw=(args.hw, args.hw),
        n_classes=2, emb_dim=16, shapes_per_image=2,
    )

    rows = []
    runs = ([None] if args.with_exact else []) + list(args.windows)
    for wdw in runs:
        r = run_one(wdw, args, paths)
        rows.append(r)
        print(json.dumps(r))
    with open(os.path.join(args.out, "window_study.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("\n| window | loss first -> last | drop | segm mAP | s/step |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['tag']} | {r['loss_first']:.2f} -> {r['loss_last']:.2f} "
            f"| {r['loss_drop_x']:.1f}x | {r['segm_mAP']} "
            f"| {r['sec_per_step']:.2f} |"
        )


if __name__ == "__main__":
    main()
