"""Synthetic COCO-format datasets and demo images.

The reference's QA story is "released checkpoints reproduce the paper
tables" (/root/reference/README.md:186-226) plus a visual smoke test on
bundled photos (examples/toilet.png). Neither is available in a
zero-egress environment, so this module is the rebuild's stand-in:

- :func:`write_synthetic_coco` emits a tiny, fully self-contained COCO
  instance dataset (images + instances/captions/class-embedding JSONs)
  whose masks are large geometric shapes — learnable to mAP≈1 by
  overfitting, which gives the end-to-end learning test
  (tests/test_e2e_learning.py) and the deformable-window accuracy study
  (tools/window_study.py) a ground-truth signal.
- :func:`draw_demo_image` renders a deterministic multi-shape scene used
  as the bundled demo input (examples/synthetic_shapes.jpg, the
  stand-in for the reference's examples/*.png).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..evaluation import rle as rle_codec

CLASS_NAMES = ("person", "dog", "cat", "car")


def _draw_shape(
    img: np.ndarray,
    mask: np.ndarray,
    kind: str,
    cy: int,
    cx: int,
    r: int,
    color: Tuple[int, int, int],
) -> None:
    """Draw a filled shape into img (H, W, 3) and its mask (H, W)."""
    h, w = mask.shape
    ys, xs = np.mgrid[0:h, 0:w]
    if kind == "square":
        m = (np.abs(ys - cy) <= r) & (np.abs(xs - cx) <= r)
    elif kind == "circle":
        m = (ys - cy) ** 2 + (xs - cx) ** 2 <= r * r
    elif kind == "diamond":
        m = np.abs(ys - cy) + np.abs(xs - cx) <= r
    else:  # triangle
        m = (ys >= cy - r) & (np.abs(xs - cx) <= (ys - (cy - r)) // 2) & (
            ys <= cy + r
        )
    img[m] = color
    mask[m] = 1


def write_synthetic_coco(
    root: str,
    n_images: int = 8,
    hw: Tuple[int, int] = (64, 64),
    n_classes: int = 2,
    emb_dim: int = 16,
    seed: int = 0,
    shapes_per_image: int = 1,
) -> Dict[str, str]:
    """Write a synthetic COCO instance dataset under ``root``.

    Each image carries ``shapes_per_image`` large non-overlapping shapes;
    the class determines the shape kind and color, so the task is
    learnable from pixels. Returns paths: images root, instance
    annotations, caption annotations, and a random class-embedding JSON
    (one ``emb_dim``-d vector per class).
    """
    import cv2

    os.makedirs(root, exist_ok=True)
    h, w = hw
    rs = np.random.RandomState(seed)
    kinds = ["square", "circle", "diamond", "triangle"]
    colors = [(220, 40, 40), (40, 220, 40), (40, 40, 220), (220, 220, 40)]
    assert n_classes <= len(CLASS_NAMES)

    images, annotations, captions = [], [], []
    ann_id = 1
    for i in range(n_images):
        img = (rs.rand(h, w, 3) * 60).astype(np.uint8)  # dark noise bg
        anns_here = []
        # place shapes on a grid so they never overlap
        cells = shapes_per_image
        for si in range(cells):
            cls = (i + si) % n_classes
            r = min(h, w) // (3 + cells)
            cy = rs.randint(r + 2, h - r - 2)
            cx_lo = 2 + si * (w // cells)
            cx_hi = (si + 1) * (w // cells) - 2
            cx = rs.randint(cx_lo + r, max(cx_lo + r + 1, cx_hi - r))
            mask = np.zeros((h, w), np.uint8)
            _draw_shape(img, mask, kinds[cls], cy, cx, r, colors[cls])
            ys, xs = np.nonzero(mask)
            bbox = [
                int(xs.min()),
                int(ys.min()),
                int(xs.max() - xs.min() + 1),
                int(ys.max() - ys.min() + 1),
            ]
            anns_here.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": cls + 1,
                    "segmentation": rle_codec.encode(mask),
                    "bbox": bbox,
                    "area": int(mask.sum()),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
        cv2.imwrite(os.path.join(root, f"img{i}.jpg"), img)
        images.append(
            {"id": i + 1, "file_name": f"img{i}.jpg", "height": h, "width": w}
        )
        annotations.extend(anns_here)
        names = sorted(
            {CLASS_NAMES[a["category_id"] - 1] for a in anns_here}
        )
        captions.append(
            {
                "id": 500 + i,
                "image_id": i + 1,
                "caption": "a photo of a " + " and a ".join(names),
            }
        )

    cats = [
        {"id": c + 1, "name": CLASS_NAMES[c]} for c in range(n_classes)
    ]
    inst_path = os.path.join(root, "inst.json")
    with open(inst_path, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations, "categories": cats},
            f,
        )
    caps_path = os.path.join(root, "caps.json")
    with open(caps_path, "w") as f:
        json.dump({"images": images, "annotations": captions}, f)
    emb_path = os.path.join(root, "class_emb.json")
    emb_rs = np.random.RandomState(seed + 1)
    with open(emb_path, "w") as f:
        json.dump(
            [
                {
                    "id": c["id"],
                    "name": c["name"],
                    "emb": emb_rs.randn(emb_dim).tolist(),
                }
                for c in cats
            ],
            f,
        )
    return {
        "root": root,
        "inst": inst_path,
        "caps": caps_path,
        "class_emb": emb_path,
    }


def tiny_overfit_config(
    paths: Dict[str, str],
    hw: Tuple[int, int] = (64, 64),
    emb_dim: int = 16,
    epochs: int = 60,
    lr: float = 3e-4,
    **model_overrides,
):
    """Config for the overfit-to-AP harness (tests/test_e2e_learning.py,
    tools/window_study.py): a small Mask2Former-Open trained on the
    synthetic dataset with captions off, everything unfrozen, and eval on
    the training images. Returns a Config."""
    from ..config import Config

    model = dict(
        num_queries=8,
        feat_channels=32,
        emb_dim=emb_dim,
        num_decoder_layers=2,
        use_caption_generation=False,
    )
    model.update(model_overrides)
    return Config.fromdict(
        dict(
            assets=dict(class_to_emb_file=paths["class_emb"]),
            model=model,
            criterion=dict(
                num_points=256, use_caption=False, use_caption_generation=False
            ),
            optimizer=dict(
                lr=lr,
                grad_clip=1.0,
                backbone_lr_mult=1.0,
                frozen_backbone_stages=-1,  # mmdet convention: -1 = none
                warmup_iters=5,
                warmup_ratio=0.1,
                lr_steps=(100000,),
            ),
            auto_scale_lr=False,
            data=dict(
                samples_per_device=1,
                workers=2,
                train=dict(
                    type="CocoDatasetOpen",
                    ann_file=paths["inst"],
                    caption_ann_file=paths["caps"],
                    img_prefix=paths["root"],
                    image_size=hw,
                    max_instances=4,
                ),
                val=dict(
                    type="CocoDatasetOpen",
                    ann_file=paths["inst"],
                    img_prefix=paths["root"],
                    test_scale=hw,
                    test_pad_bucket=hw,
                ),
            ),
            eval_types=("all_results",),
            metrics=("segm", "bbox"),
            max_epochs=epochs,
            log_interval=1,
            eval_interval=10 * epochs,  # eval driven by the caller
        )
    )


def draw_demo_image(
    path: Optional[str] = None, hw: Tuple[int, int] = (480, 640)
) -> np.ndarray:
    """Deterministic multi-object demo scene (examples/synthetic_shapes.jpg)."""
    import cv2

    h, w = hw
    rs = np.random.RandomState(7)
    # sky-to-ground gradient background
    img = np.linspace(180, 60, h, dtype=np.float32)[:, None, None] * np.ones(
        (1, w, 3), np.float32
    )
    img = (img + rs.rand(h, w, 3) * 20).astype(np.uint8)
    mask = np.zeros((h, w), np.uint8)
    _draw_shape(img, mask, "square", int(h * 0.62), int(w * 0.25), 70, (200, 60, 40))
    _draw_shape(img, mask, "circle", int(h * 0.4), int(w * 0.6), 80, (40, 180, 60))
    _draw_shape(img, mask, "diamond", int(h * 0.7), int(w * 0.8), 60, (60, 60, 210))
    if path:
        cv2.imwrite(path, img)
    return img
