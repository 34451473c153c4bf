"""Device-trace ONLY the pixel decoder (channels-major encoder) at the
flagship eval shape, then summarize with tools/parse_trace.py.

profile_bench's --trace OOMs at batch 16 because every stage's buffers
stay resident; this builds just backbone feats (shapes only) and traces
the pixel-decoder jit alone.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from betrayed_by_captions_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from betrayed_by_captions_tpu.models.detector import Mask2FormerOpen

HW = (800, 1344)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--impl", default="windowed_pallas")
    ap.add_argument("--trace", default="/tmp/trace_pixdec")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

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
    images = jnp.zeros((1, HW[0], HW[1], 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images)["params"]

    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(
            rng.randn(args.batch, HW[0] // s, HW[1] // s, c) * 0.1,
            jnp.bfloat16,
        )
        for s, c in [(4, 256), (8, 512), (16, 1024), (32, 2048)]
    ]

    @jax.jit
    def pixdec_only(params, feats):
        return model.apply(
            {"params": params}, feats, method=lambda m, f: m.head.pixel_decoder(f)
        )

    out = pixdec_only(params, feats)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))

    with jax.profiler.trace(args.trace):
        for _ in range(args.iters):
            out = pixdec_only(params, feats)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))
    print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
