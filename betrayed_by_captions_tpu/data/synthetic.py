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
    r_range: Optional[Tuple[int, int]] = None,
) -> Dict[str, str]:
    """Write a synthetic COCO instance dataset under ``root``.

    Each image carries ``shapes_per_image`` large shapes; the class
    determines the shape kind and color, so the task is learnable from
    pixels. Returns paths: images root, instance annotations, caption
    annotations, and a random class-embedding JSON (one ``emb_dim``-d
    vector per class).

    With ``r_range=(lo, hi)`` instance radii vary per shape and shapes
    are placed at random positions, so later shapes OCCLUDE earlier ones
    (visible-region GT masks, like real COCO). Without it, shapes sit in
    a fixed-size non-overlapping column grid (the original overfit-test
    layout). Instances whose visible area drops below 16 px are dropped.
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
        inst_masks: List[np.ndarray] = []
        inst_cls: List[int] = []
        cells = shapes_per_image
        for si in range(cells):
            if r_range is not None:
                cls = int(rs.randint(n_classes))
                r = int(rs.randint(r_range[0], r_range[1] + 1))
                r = min(r, (min(h, w) - 6) // 2)
                cy = int(rs.randint(r + 2, h - r - 2))
                cx = int(rs.randint(r + 2, w - r - 2))
            else:
                cls = (i + si) % n_classes
                r = min(h, w) // (3 + cells)
                cy = rs.randint(r + 2, h - r - 2)
                cx_lo = 2 + si * (w // cells)
                cx_hi = (si + 1) * (w // cells) - 2
                cx = rs.randint(cx_lo + r, max(cx_lo + r + 1, cx_hi - r))
            mask = np.zeros((h, w), np.uint8)
            _draw_shape(img, mask, kinds[cls], cy, cx, r, colors[cls])
            # this shape is drawn on top: clear its pixels from earlier
            # instances so every GT mask is the visible region
            for prev in inst_masks:
                prev[mask > 0] = 0
            inst_masks.append(mask)
            inst_cls.append(cls)
        for mask, cls in zip(inst_masks, inst_cls):
            if mask.sum() < 16:
                continue  # fully (or nearly) occluded
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
    val_paths: Optional[Dict[str, str]] = None,
    num_queries: int = 8,
    max_instances: int = 4,
    **model_overrides,
):
    """Config for the overfit-to-AP harness (tests/test_e2e_learning.py,
    tools/window_study.py): a small Mask2Former-Open trained on the
    synthetic dataset with captions off and everything unfrozen. Eval runs
    on the training images by default, or on a held-out split when
    ``val_paths`` (a second :func:`write_synthetic_coco` result) is given
    — that is the generalization harness (VERDICT r2 items 3/6). Returns
    a Config."""
    from ..config import Config

    model = dict(
        num_queries=num_queries,
        feat_channels=32,
        emb_dim=emb_dim,
        num_decoder_layers=2,
        use_caption_generation=False,
    )
    model.update(model_overrides)
    vp = val_paths or paths
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
                    max_instances=max_instances,
                ),
                val=dict(
                    type="CocoDatasetOpen",
                    ann_file=vp["inst"],
                    img_prefix=vp["root"],
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


def write_synthetic_coco_panoptic(
    root: str,
    n_images: int = 8,
    hw: Tuple[int, int] = (64, 64),
    emb_dim: int = 16,
    seed: int = 0,
) -> Dict[str, str]:
    """Write a synthetic COCO-panoptic dataset under ``root``.

    Each scene has 2 thing instances (square "person" / circle "dog",
    color-coded) over a "grass" stuff band filling the bottom third, in
    panoptic PNG + segments_info format (the reference's OSPS input,
    coco_panoptic_open.py:120-360). Learnable to PQ~100 by overfitting —
    the panoptic twin of :func:`write_synthetic_coco` for the train->eval
    PQ harness (tests/test_e2e_learning.py).
    """
    import cv2

    from .panoptic_codec import id2rgb

    os.makedirs(os.path.join(root, "pngs"), exist_ok=True)
    h, w = hw
    rs = np.random.RandomState(seed)
    cats = [
        {"id": 1, "name": "person", "isthing": 1},
        {"id": 2, "name": "dog", "isthing": 1},
        {"id": 7, "name": "grass", "isthing": 0},
    ]
    thing_kinds = {1: "square", 2: "circle"}
    thing_colors = {1: (220, 40, 40), 2: (40, 220, 40)}
    grass_color = (40, 160, 160)

    images, annotations, captions = [], [], []
    for i in range(n_images):
        img = (rs.rand(h, w, 3) * 50).astype(np.uint8)
        pan = np.zeros((h, w), np.int64)  # 0 = VOID
        segments = []
        # stuff: grass band over the bottom third
        band = h - h // 3
        img[band:, :] = grass_color
        pan[band:, :] = 7000
        # things: one person + one dog in the top two-thirds
        for si, cat_id in enumerate((1, 2)):
            r = min(h, w) // 6
            cy = rs.randint(r + 2, band - r - 2)
            cx_lo = 2 + si * (w // 2)
            cx = rs.randint(cx_lo + r, cx_lo + w // 2 - r - 2)
            mask = np.zeros((h, w), np.uint8)
            _draw_shape(
                img, mask, thing_kinds[cat_id], cy, cx, r,
                thing_colors[cat_id],
            )
            seg_id = 10 + si
            pan[mask > 0] = seg_id
            segments.append(
                {
                    "id": seg_id,
                    "category_id": cat_id,
                    "iscrowd": 0,
                    "area": int(mask.sum()),
                }
            )
        # grass area after thing occlusion
        segments.append(
            {
                "id": 7000,
                "category_id": 7,
                "iscrowd": 0,
                "area": int((pan == 7000).sum()),
            }
        )
        cv2.imwrite(os.path.join(root, f"img{i}.jpg"), img)
        cv2.imwrite(
            os.path.join(root, "pngs", f"img{i}.png"),
            cv2.cvtColor(id2rgb(pan), cv2.COLOR_RGB2BGR),
        )
        images.append(
            {"id": i + 1, "file_name": f"img{i}.jpg", "height": h, "width": w}
        )
        annotations.append(
            {
                "image_id": i + 1,
                "file_name": f"img{i}.png",
                "segments_info": segments,
            }
        )
        captions.append(
            {
                "id": 500 + i,
                "image_id": i + 1,
                "caption": "a person and a dog on the grass",
            }
        )

    ann_path = os.path.join(root, "panoptic.json")
    with open(ann_path, "w") as f:
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
        "ann": ann_path,
        "seg_root": os.path.join(root, "pngs"),
        "caps": caps_path,
        "class_emb": emb_path,
    }


def tiny_panoptic_config(
    paths: Dict[str, str],
    hw: Tuple[int, int] = (64, 64),
    emb_dim: int = 16,
    epochs: int = 60,
    lr: float = 3e-4,
    **model_overrides,
):
    """Panoptic twin of :func:`tiny_overfit_config`: train on the
    synthetic OSPS dataset and evaluate through the panoptic fusion +
    open-set PQ stack (engine/test_loop._evaluate_panoptic)."""
    from ..config import Config

    model = dict(
        num_queries=8,
        feat_channels=32,
        emb_dim=emb_dim,
        num_decoder_layers=2,
        use_caption_generation=False,
    )
    model.update(model_overrides)
    ds = dict(
        type="CocoPanopticDatasetOpen",
        ann_file=paths["ann"],
        img_prefix=paths["root"],
        seg_prefix=paths["seg_root"],
    )
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
                frozen_backbone_stages=-1,
                warmup_iters=5,
                warmup_ratio=0.1,
                lr_steps=(100000,),
            ),
            auto_scale_lr=False,
            data=dict(
                samples_per_device=1,
                workers=2,
                train=dict(
                    image_size=hw, max_instances=4,
                    caption_ann_file=paths["caps"], **ds
                ),
                val=dict(test_scale=hw, test_pad_bucket=hw, **ds),
            ),
            max_epochs=epochs,
            log_interval=1,
            eval_interval=10 * epochs,
            # the reference's 4096-px stuff_area_limit assumes COCO-scale
            # inputs (~0.4% of an 800x1344 image); at 64^2 the whole image
            # is 4096 px and the grass band (~1300 px) must survive
            stuff_area_limit=max(16, (hw[0] * hw[1]) // 256),
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
