"""Component-level timing of the flagship inference path on real hardware.

Breaks bench.py's 'full_inference' into stages and times each jitted in
isolation (backbone / pixel decoder / deformable-attn op / transformer
decoder / mask upsample / post-processing), so perf work targets the real
bottleneck. Defaults mirror bench.py (windowed Pallas kernel, window 4,
bf16). Writes findings to stdout; PERF.md summarizes.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from betrayed_by_captions_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from betrayed_by_captions_tpu.models.detector import Mask2FormerOpen

HW = (800, 1344)


def _fetch(out):
    """Force real completion: device->host copy of one element (the axon
    tunnel's block_until_ready resolves without waiting for compute)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="windowed_pallas",
                    choices=["exact", "windowed", "windowed_pallas"])
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--variant", default="merged",
                    choices=["cell", "packed", "merged"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    args = ap.parse_args()
    batch = args.batch

    def timeit(fn, *fargs, warmup=2, iters=8, name=""):
        for _ in range(warmup):
            _fetch(fn(*fargs))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*fargs)
        _fetch(out)  # device serializes the queued executions
        dt = (time.perf_counter() - t0) / iters
        print(
            f"{name:44s} {dt * 1000:10.2f} ms  "
            f"({dt * 1000 / batch:.2f} ms/img)"
        )
        return dt

    model = Mask2FormerOpen(
        num_classes=48,
        num_queries=100,
        feat_channels=256,
        emb_dim=768,
        num_decoder_layers=9,
        use_caption_generation=False,
        attn_impl=args.impl,
        deform_window=args.window,
        dtype=jnp.bfloat16,
    )
    images = jnp.zeros((batch, HW[0], HW[1], 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images[:1])["params"]

    # 1. backbone only
    @jax.jit
    def backbone_only(params, images):
        return model.apply({"params": params}, images, method=lambda m, x: m.backbone(x))

    feats = backbone_only(params, images)
    timeit(backbone_only, params, images, name="backbone (R50)")

    # 2. pixel decoder only (input: backbone feats)
    @jax.jit
    def pixdec_only(params, feats):
        return model.apply(
            {"params": params}, feats, method=lambda m, f: m.head.pixel_decoder(f)
        )

    mask_features, memories = pixdec_only(params, feats)
    timeit(pixdec_only, params, feats, name="pixel decoder (6x deform enc + FPN)")

    # 3. full forward
    @jax.jit
    def full_forward(params, images):
        return model.apply({"params": params}, images)

    out = full_forward(params, images)
    timeit(full_forward, params, images, name="full forward (backbone+head)")

    # 4. deformable attn op alone at encoder shapes
    shapes = [(HW[0] // 32, HW[1] // 32), (HW[0] // 16, HW[1] // 16), (HW[0] // 8, HW[1] // 8)]
    s = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(batch, s, 8, 32), jnp.bfloat16)
    locs = jnp.asarray(rng.rand(batch, s, 8, 3, 4, 2), jnp.float32)
    wgts = jax.nn.softmax(
        jnp.asarray(rng.randn(batch, s, 8, 3, 4), jnp.float32).reshape(batch, s, 8, 12)
    ).reshape(batch, s, 8, 3, 4).astype(jnp.bfloat16)

    if args.impl == "windowed_pallas":
        from betrayed_by_captions_tpu.ops.deform_attn_windowed_pallas import (
            windowed_ms_deform_attn_pallas,
        )

        pl_op = jax.jit(
            lambda v, l, w: windowed_ms_deform_attn_pallas(
                v, shapes, l, w, window=args.window, variant=args.variant
            )
        )
        r = pl_op(value, locs, wgts)
        jax.block_until_ready(r)
        timeit(
            pl_op, value, locs, wgts,
            name=f"deform attn Pallas/{args.variant} (1 layer, S={s})",
        )
    else:
        from betrayed_by_captions_tpu.ops.deform_attn import ms_deform_attn

        xla_op = jax.jit(lambda v, l, w: ms_deform_attn(v, shapes, l, w))
        xla_op(value, locs, wgts)
        timeit(xla_op, value, locs, wgts, name=f"ms_deform_attn XLA (1 layer, S={s})")

    # 5. eval step without upsample (forward only, stride-4 masks)
    from betrayed_by_captions_tpu.engine.train_step import make_eval_step

    eval_step = make_eval_step(model, upsample=False)
    ev = eval_step(params, images)
    timeit(eval_step, params, images, name="eval step (forward, stride-4 masks)")

    # 6. fused postproc (upsample + shared per-query stats + selection)
    from betrayed_by_captions_tpu.models.class_banks import asset_path, load_class_banks
    from betrayed_by_captions_tpu.models.fusion_head import (
        instance_postprocess_shared,
    )

    banks = load_class_banks(
        asset_path("embeddings", "coco_class_with_bert_emb.json"),
        known_file=asset_path("splits", "known_65.txt"),
        unknown_file=asset_path("splits", "unknown_17.txt"),
    )
    all_bank = jnp.asarray(banks.all_bank)

    @jax.jit
    def postproc(emb, masks):
        sel, mb = instance_postprocess_shared(
            emb, masks, {"all": all_bank}, out_hw=HW, max_per_image=100
        )
        r = sel["all"]
        return r.labels, r.scores, r.boxes, r.query_idx, mb.sum(axis=(1, 2, 3))

    postproc(ev["cls_emb_preds"], ev["mask_preds"])
    timeit(
        postproc, ev["cls_emb_preds"], ev["mask_preds"],
        name="fused postproc (upsample+stats+select)",
    )

    # 7. upsample alone (materializes full-res bf16 logits: OOMs at
    # batch 16 with the other stage buffers resident — informational only)
    try:
        from betrayed_by_captions_tpu.ops.resize import bilinear_resize

        masks_small = ev["mask_preds"].astype(jnp.bfloat16)
        up = jax.jit(lambda m: bilinear_resize(m, HW[0], HW[1]))
        up(masks_small)
        timeit(
            up, masks_small,
            name=f"mask upsample bf16 {tuple(masks_small.shape)} -> {HW}",
        )
    except Exception as e:  # noqa: BLE001
        print(f"mask upsample alone: skipped ({type(e).__name__})")

    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(full_forward(params, images))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
