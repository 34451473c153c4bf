#!/usr/bin/env python
"""Evaluation CLI (reference tools/test.py equivalent).

Usage:
    python tools/test.py configs/instance/coco_b48n17.py \
        work_dirs/coco_b48n17/params.npz --eval segm bbox \
        [--max-images 500] [--cfg-options ...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from betrayed_by_captions_tpu.config import Config, parse_cli_options


def main():
    parser = argparse.ArgumentParser(description="Evaluate a checkpoint")
    parser.add_argument("config")
    parser.add_argument("checkpoint", help="params .npz (engine.checkpoint.save_params)")
    parser.add_argument("--eval", nargs="+", default=["segm", "bbox"])
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--cfg-options", nargs="+", default=[])
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="force jax.distributed.initialize (multi-host launch; also "
        "auto-detected from the TPU runtime / JAX_* env vars)",
    )
    args = parser.parse_args()

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_cli_options(args.cfg_options))
    cfg["metrics"] = args.eval

    from betrayed_by_captions_tpu.parallel.multihost import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed(force=args.distributed)

    import jax
    import jax.numpy as jnp

    from betrayed_by_captions_tpu.engine.checkpoint import load_params
    from betrayed_by_captions_tpu.engine.test_loop import evaluate
    from betrayed_by_captions_tpu.engine.train_loop import build_banks
    from betrayed_by_captions_tpu.models.detector import build_detector

    banks = build_banks(cfg)
    model_cfg = dict(cfg.model)
    model_cfg.setdefault("num_classes", banks.num_base)
    model = build_detector(Config.fromdict(model_cfg))
    sample = jnp.zeros((1, 128, 128, 3), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), sample, method="init_forward")[
        "params"
    ]
    params = load_params(args.checkpoint, template)

    metrics = evaluate(cfg, params, work_dir=args.work_dir, max_images=args.max_images)
    print(json.dumps({k: float(v) for k, v in metrics.items()}, indent=2))


if __name__ == "__main__":
    main()
