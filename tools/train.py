#!/usr/bin/env python
"""Training CLI (reference tools/train.py equivalent).

Usage:
    python tools/train.py configs/instance/coco_b48n17.py \
        --work-dir work_dirs/coco_b48n17 [--resume] \
        [--cfg-options model.num_queries=100 data.workers=8]

Smoke mode (no COCO needed): ``--synthetic`` ignores the config's data
section and trains the tiny overfit harness on a generated synthetic
dataset (data/synthetic.py) — an end-to-end CLI check of the full
training loop.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from betrayed_by_captions_tpu.config import Config, parse_cli_options


def main():
    parser = argparse.ArgumentParser(description="Train an open-vocabulary segmentor")
    parser.add_argument("config", help="config file path")
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--resume", action="store_true", help="auto-resume")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument(
        "--cfg-options", nargs="+", default=[], help="key=value overrides"
    )
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="force jax.distributed.initialize (multi-host launch; also "
        "auto-triggered by COORDINATOR_ADDRESS/NUM_PROCESSES env vars)",
    )
    parser.add_argument(
        "--synthetic",
        action="store_true",
        help="smoke mode: train the tiny overfit harness on generated "
        "synthetic data instead of the config's datasets",
    )
    parser.add_argument(
        "--synthetic-epochs", type=int, default=20,
        help="epochs for --synthetic (150 overfits to mAP~1)",
    )
    args = parser.parse_args()

    from betrayed_by_captions_tpu.parallel.multihost import (
        maybe_initialize_distributed,
    )

    pid, pcount = maybe_initialize_distributed(force=args.distributed)
    if pcount > 1:
        print(f"multi-host: process {pid}/{pcount}")

    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0]
    )

    if args.synthetic:
        import betrayed_by_captions_tpu.engine.train_loop as tl
        from betrayed_by_captions_tpu.data.synthetic import (
            tiny_overfit_config,
            write_synthetic_coco,
        )
        from betrayed_by_captions_tpu.models import bert as bert_mod

        paths = write_synthetic_coco(
            os.path.join(work_dir, "synthetic_data"),
            n_images=8, hw=(64, 64), n_classes=2, emb_dim=16,
            shapes_per_image=2,
        )
        cfg = tiny_overfit_config(paths, epochs=args.synthetic_epochs)
        cfg.merge_from_options(parse_cli_options(args.cfg_options))
        bert_mod.load_bert_assets = (
            lambda path=None, allow_synthetic=False: (
                bert_mod.synthetic_bert_assets(200, 16)
            )
        )
        tl.load_bert_assets = bert_mod.load_bert_assets
        tl.train(cfg, work_dir, resume=args.resume)
        return

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_cli_options(args.cfg_options))
    if args.seed is not None:
        cfg["seed"] = args.seed

    from betrayed_by_captions_tpu.engine.train_loop import train

    train(cfg, work_dir, resume=args.resume)


if __name__ == "__main__":
    main()
