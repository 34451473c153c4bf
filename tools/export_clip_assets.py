#!/usr/bin/env python
"""Export the CLIP RN50 text tower into assets/clip_text.npz.

Run once in an environment with the released CLIP checkpoint (either the
``clip`` package or a raw state-dict .pt):

    python tools/export_clip_assets.py clip_rn50.pt \
        betrayed_by_captions_tpu/assets/clip_text.npz

Maps the torch text-tower layout onto models/clip_text.CLIPTextEncoder:
token_embedding / positional_embedding / 12 resblocks (packed qkv split
into flax SelfAttention q/k/v/out with (C, H, D) kernel shapes) /
ln_final / text_projection.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def convert(sd):
    from betrayed_by_captions_tpu.models.clip_text import ClipTextConfig

    cfg = ClipTextConfig()
    w = cfg.width
    h = cfg.heads
    d = w // h
    out = {}

    def put(k, v):
        out[k] = np.asarray(v)

    put("token_embedding/embedding", sd["token_embedding.weight"])
    put("positional_embedding", sd["positional_embedding"])
    put("text_projection", sd["text_projection"])
    put("ln_final/scale", sd["ln_final.weight"])
    put("ln_final/bias", sd["ln_final.bias"])
    for li in range(cfg.layers):
        p = f"transformer.resblocks.{li}"
        q = f"resblock{li}"
        put(f"{q}/ln_1/scale", sd[f"{p}.ln_1.weight"])
        put(f"{q}/ln_1/bias", sd[f"{p}.ln_1.bias"])
        put(f"{q}/ln_2/scale", sd[f"{p}.ln_2.weight"])
        put(f"{q}/ln_2/bias", sd[f"{p}.ln_2.bias"])
        wq, wk, wv = np.split(np.asarray(sd[f"{p}.attn.in_proj_weight"]), 3)
        bq, bk, bv = np.split(np.asarray(sd[f"{p}.attn.in_proj_bias"]), 3)
        for name, wt, bt in (("query", wq, bq), ("key", wk, bk), ("value", wv, bv)):
            put(f"{q}/attn/{name}/kernel", wt.T.reshape(w, h, d))
            put(f"{q}/attn/{name}/bias", bt.reshape(h, d))
        put(
            f"{q}/attn/out/kernel",
            np.asarray(sd[f"{p}.attn.out_proj.weight"]).T.reshape(h, d, w),
        )
        put(f"{q}/attn/out/bias", sd[f"{p}.attn.out_proj.bias"])
        put(f"{q}/fc/kernel", np.asarray(sd[f"{p}.mlp.c_fc.weight"]).T)
        put(f"{q}/fc/bias", sd[f"{p}.mlp.c_fc.bias"])
        put(f"{q}/proj/kernel", np.asarray(sd[f"{p}.mlp.c_proj.weight"]).T)
        put(f"{q}/proj/bias", sd[f"{p}.mlp.c_proj.bias"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("clip_ckpt", help="torch .pt with the CLIP state dict")
    ap.add_argument("out_npz")
    args = ap.parse_args()

    import torch

    obj = torch.load(args.clip_ckpt, map_location="cpu")
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    sd = {k: v.float().numpy() for k, v in sd.items() if "visual" not in k}
    out = convert(sd)
    np.savez(args.out_npz, **out)
    print(f"wrote {len(out)} arrays to {args.out_npz}")


if __name__ == "__main__":
    main()
