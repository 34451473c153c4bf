#!/usr/bin/env python
"""Training CLI (reference tools/train.py equivalent).

Usage:
    python tools/train.py configs/instance/coco_b48n17.py \
        --work-dir work_dirs/coco_b48n17 [--resume] \
        [--cfg-options model.num_queries=100 data.workers=8]
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
    args = parser.parse_args()

    from betrayed_by_captions_tpu.parallel.multihost import (
        maybe_initialize_distributed,
    )

    pid, pcount = maybe_initialize_distributed(force=args.distributed)
    if pcount > 1:
        print(f"multi-host: process {pid}/{pcount}")

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_cli_options(args.cfg_options))
    if args.seed is not None:
        cfg["seed"] = args.seed
    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0]
    )

    from betrayed_by_captions_tpu.engine.train_loop import train

    train(cfg, work_dir, resume=args.resume)


if __name__ == "__main__":
    main()
