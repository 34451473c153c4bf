"""Training-step throughput on real hardware (synthetic batch).

Measures the full jitted train step — forward, on-device Hungarian
assignment, all CGG losses, backward through the custom-VJP windowed
deformable kernels, grad clip + AdamW — at the reference training
resolution (1024x1024 LSJ crops, configs/instance/coco_b48n17.py:195-218).
The driver's bench.py measures inference; this tool tracks the training
side of the ledger (PERF.md). Uses the synthetic BERT table (timing only;
real runs load exported assets).

Usage: python tools/bench_train.py [--batch 8] [--iters 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from betrayed_by_captions_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--hw", type=int, nargs=2, default=(1024, 1024))
    ap.add_argument("--impl", default="windowed_pallas")
    ap.add_argument(
        "--window",
        type=lambda s: int(s) if "," not in s
        else tuple(int(x) for x in s.split(",")),
        default=8,
        help="int or comma tuple ('8,6,4' = per-value-level mixed)",
    )
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument(
        "--gt-downsample", type=int, default=4,
        help="CriterionConfig.gt_point_downsample (4 = GT targets at the "
        "mask-logit stride, the shipped-config default — accuracy-neutral "
        "per tools/gtds_study.py; 1 = reference-exact full-res sampling)",
    )
    ap.add_argument(
        "--trace",
        default=None,
        help="also capture a device trace of one step to this directory "
        "(summarize with tools/parse_trace.py <dir> --iters 1)",
    )
    args = ap.parse_args()

    from betrayed_by_captions_tpu.engine.optim import (
        OptimizerConfig,
        build_optimizer,
    )
    from betrayed_by_captions_tpu.engine.train_state import create_train_state
    from betrayed_by_captions_tpu.engine.train_step import make_train_step
    from betrayed_by_captions_tpu.losses.criterion import CriterionConfig
    from betrayed_by_captions_tpu.models.bert import (
        BertWordEmbeddings,
        synthetic_bert_assets,
    )
    from betrayed_by_captions_tpu.models.class_banks import (
        asset_path,
        load_class_banks,
    )
    from betrayed_by_captions_tpu.models.detector import Mask2FormerOpen

    b = args.batch
    hw = tuple(args.hw)
    max_inst, cap_len, n_nouns = 100, 35, 8

    banks = load_class_banks(
        asset_path("embeddings", "coco_class_with_bert_emb.json"),
        known_file=asset_path("splits", "known_65.txt"),
        unknown_file=asset_path("splits", "unknown_17.txt"),
    )
    model = Mask2FormerOpen(
        num_classes=banks.num_base,
        num_queries=100,
        feat_channels=256,
        emb_dim=768,
        num_decoder_layers=9,
        # flagship finetune freezes stem+layer1..3 (stop_gradient saves
        # their backward activations; reference frozen_stages=3)
        frozen_backbone_stages=3,
        use_caption_generation=True,
        attn_impl=args.impl,
        deform_window=args.window,
        remat=not args.no_remat,
        dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(b, *hw, 3), jnp.float32),
        "gt_labels": jnp.asarray(
            rng.randint(0, banks.num_base, (b, max_inst)), jnp.int32
        ),
        # uint8 like the real loader (data/transforms.py): full-res GT
        # masks at f32 would add 3.4 GB to the batch-8 training footprint
        "gt_masks": jnp.asarray(
            (rng.rand(b, max_inst, *hw) > 0.9), jnp.uint8
        ),
        "num_gts": jnp.full((b,), 15, jnp.int32),
        "caption_ids": jnp.asarray(
            rng.randint(1, 30000, (b, cap_len)), jnp.int32
        ),
        "caption_mask": jnp.ones((b, cap_len), jnp.int32),
        "caption_nouns_ids": jnp.asarray(
            rng.randint(1, 30000, (b, n_nouns)), jnp.int32
        ),
        "caption_nouns_mask": jnp.ones((b, n_nouns), jnp.int32),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["image"][:1], method="init_forward"
    )["params"]
    bert = BertWordEmbeddings(synthetic_bert_assets())

    tx, _ = build_optimizer(params, OptimizerConfig())
    state = create_train_state(params, tx)
    step = make_train_step(
        model,
        CriterionConfig(
            num_classes=banks.num_base,
            gt_point_downsample=args.gt_downsample,
        ),
        jnp.asarray(banks.base_bank),
        bert,
    )

    key = jax.random.PRNGKey(1)
    # force completion by FETCHING a scalar, not block_until_ready: via
    # the axon tunnel block_until_ready can return before the chip
    # finishes (PERF.md measurement gotchas; a batch-8 step once "timed"
    # at 34 ms/step with block-only)
    state, metrics = step(state, batch, key)
    float(metrics["loss"])
    for _ in range(2):
        state, metrics = step(state, batch, key)
    float(metrics["loss"])

    if args.trace:
        with jax.profiler.trace(args.trace):
            state, metrics = step(state, batch, key)
            jax.block_until_ready(metrics["loss"])
        print(f"trace written to {args.trace}")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch, key)
    loss = float(metrics["loss"])  # forces the whole step chain
    dt = (time.perf_counter() - t0) / args.iters
    print(
        f"train step: {dt * 1000:.1f} ms/step, "
        f"{b / dt:.2f} img/s/chip (batch {b}, {hw[0]}x{hw[1]}), "
        f"loss={loss:.2f}"
    )


if __name__ == "__main__":
    main()
