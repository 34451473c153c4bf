#!/usr/bin/env python
"""GT point-sampling resolution accuracy study (VERDICT round-1 item 6).

The reference samples GT mask point targets at full training resolution
(/root/reference/open_set/models/mask2former_head.py:609-613);
``CriterionConfig.gt_point_downsample=k`` first takes an exact bilinear
k-x downsample of the GT masks so the tent-matmul sampling contracts
over H/k instead of H (k=4 cuts ~2.2 s/step at the batch-4 flagship
shape, PERF.md round-3; at batch 8 the k=1 einsums alone are ~3 s/step).
The deviation only softens targets at instance boundaries — but until
this study there was no accuracy signal attached to that claim.

Protocol (same harness as tools/window_study.py): overfit the synthetic
shape dataset, eval on the training images, compare loss trajectory and
overfit AP at k=1 (reference-exact) vs k=4 (TPU speed default).

Usage:
    python tools/gtds_study.py [--ks 1 4] [--epochs 60] [--hw 128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_one(k, args, paths):
    import jax

    import betrayed_by_captions_tpu.engine.train_loop as tl
    from betrayed_by_captions_tpu.data.synthetic import tiny_overfit_config
    from betrayed_by_captions_tpu.engine import test_loop
    from betrayed_by_captions_tpu.models import bert as bert_mod

    cfg = tiny_overfit_config(
        paths,
        hw=(args.hw, args.hw),
        epochs=args.epochs,
        lr=args.lr,
        attn_impl=args.attn_impl,
        deform_window=args.window,
    )
    cfg.criterion.gt_point_downsample = k
    cfg.data.samples_per_device = max(1, 8 // jax.device_count())

    tag = f"k{k}"
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
        "sec_per_step": train_time / max(1, args.epochs),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--attn-impl", default="windowed_pallas")
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--out", default="work_dirs/gtds_study")
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
        os.path.join(args.out, "data"),
        n_images=8,
        hw=(args.hw, args.hw),
        n_classes=2,
        emb_dim=16,
        shapes_per_image=2,
    )

    rows = []
    for k in args.ks:
        r = run_one(k, args, paths)
        rows.append(r)
        print(json.dumps(r))
    with open(os.path.join(args.out, "gtds_study.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("\n| gt downsample | loss first -> last | drop | segm mAP | s/step |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['tag']} | {r['loss_first']:.2f} -> {r['loss_last']:.2f} "
            f"| {r['loss_drop_x']:.1f}x | {r['segm_mAP']} "
            f"| {r['sec_per_step']:.2f} |"
        )


if __name__ == "__main__":
    main()
