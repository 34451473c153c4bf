#!/usr/bin/env python
"""Per-stage host input-pipeline profile (VERDICT round-4 #7).

The 1-core TPU hosts produce ~3.75 s/image at 1024^2 LSJ (round-4 soak:
data_time p50 19.6 s at batch 8 vs ~5 s chip step) and nobody has
measured WHERE that goes.  This tool times each stage of the training
sample path — PNG decode, flip, LSJ resize (image + per-instance
masks), crop, filter, pad, normalize, instance-slot packing — on real
dataset samples, printing a per-stage ms table and the implied
img/s/core.

Usage:
    python tools/host_profile.py [--hw 1024] [--n 6] [--instances 8]

Runs entirely on the host (no JAX device use) — safe alongside chip
jobs ONLY if reniced; on the 1-core hosts run it while the chip is
otherwise idle.

Reference counterpart: mmdet pipeline stages,
/root/reference/configs/instance/coco_b48n17.py:195-218 (dataloader
workers, open_set/apis/train.py:149).
"""

import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, reps):
    out = None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000, out  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=1024)
    ap.add_argument("--n", type=int, default=4, help="timing reps/stage")
    ap.add_argument("--instances", type=int, default=8)
    ap.add_argument("--max-instances", type=int, default=8)
    ap.add_argument("--ratio", type=float, default=1.6,
                    help="fixed LSJ ratio for reproducible stage sizes "
                    "(1.6 = upper-mid of the 0.1-2.0 range)")
    ap.add_argument("--out", default=None, help="append JSON line here")
    args = ap.parse_args()

    from PIL import Image

    from betrayed_by_captions_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        TrainTransform,
        _resize_image,
        _resize_masks,
    )

    hw = args.hw
    rng = np.random.RandomState(0)
    # a synthetic scene of the soak's kind: uint8 RGB + instance masks
    img_u8 = rng.randint(0, 255, (hw, hw, 3), np.uint8)
    masks = np.zeros((args.instances, hw, hw), np.uint8)
    for i in range(args.instances):
        y, x = rng.randint(0, hw, 2)
        r = rng.randint(hw // 16, hw // 4)
        yy, xx = np.ogrid[:hw, :hw]
        masks[i] = ((yy - y) ** 2 + (xx - x) ** 2 < r * r).astype(np.uint8)
    labels = rng.randint(0, 2, args.instances).astype(np.int64)

    # PNG round-trip (what the dataset actually decodes per sample)
    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, format="PNG")
    png_bytes = buf.getvalue()

    stages = {}
    stages["png_decode"], dec = timeit(
        lambda: np.asarray(Image.open(io.BytesIO(png_bytes)).convert("RGB")),
        args.n,
    )

    th = tw = hw
    ratio = args.ratio
    scale = min(th * ratio / hw, tw * ratio / hw)
    new_h = new_w = max(1, int(hw * scale + 0.5))

    stages["astype_f32"], img_f = timeit(
        lambda: img_u8.astype(np.float32), args.n
    )
    stages["flip_f32"], _ = timeit(
        lambda: np.ascontiguousarray(img_f[:, ::-1]), args.n
    )
    stages["resize_img_f32"], img_r = timeit(
        lambda: _resize_image(img_f, new_w, new_h), args.n
    )
    stages["resize_img_u8"], _ = timeit(
        lambda: _resize_image(img_u8, new_w, new_h), args.n
    )
    stages["resize_masks"], masks_r = timeit(
        lambda: _resize_masks(masks, new_w, new_h), args.n
    )
    y0 = max(0, (new_h - th) // 2)
    img_c = img_r[y0 : y0 + th, y0 : y0 + tw]
    masks_c = masks_r[:, y0 : y0 + th, y0 : y0 + tw]
    stages["filter_sum"], _ = timeit(
        lambda: masks_c.reshape(masks_c.shape[0], -1).sum(axis=1) > 0,
        args.n,
    )
    stages["filter_any"], _ = timeit(
        lambda: masks_c.any(axis=(1, 2)), args.n
    )
    stages["normalize"], _ = timeit(
        lambda: (img_c.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD,
        args.n,
    )
    stages["slot_pack"], _ = timeit(
        lambda: np.zeros((args.max_instances, th, tw), np.uint8),
        args.n,
    )

    # the full current transform, end to end (decode excluded)
    tt = TrainTransform(
        image_size=(th, tw), max_instances=args.max_instances
    )
    stages["full_transform"], _ = timeit(
        lambda: tt(img_u8, masks, labels, np.random.RandomState(1)),
        args.n,
    )
    stages["full_with_decode"] = stages["full_transform"] + stages["png_decode"]

    report = {
        "hw": hw,
        "ratio": ratio,
        "resized_to": [new_h, new_w],
        "instances": args.instances,
        "stages_ms": {k: round(v, 1) for k, v in stages.items()},
        "img_per_s_core": round(1000.0 / stages["full_with_decode"], 2),
    }
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(report) + "\n")


if __name__ == "__main__":
    main()
