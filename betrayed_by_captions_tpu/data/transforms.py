"""Host-side image/annotation transforms with fixed-shape output contracts.

TPU-native redesign of the reference's mmdet train/test pipelines
(configs/instance/coco_b48n17.py:195-233):

train: RandomFlip(0.5) -> large-scale-jitter Resize (1024^2 target,
ratio 0.1-2.0, keep ratio) -> RandomCrop 1024^2 (allow negative) ->
FilterAnnotations(by_mask) -> Pad(1024^2, img 128) -> Normalize ->
fixed-size arrays (MAX_INST instance slots + validity count) instead of
the reference's DataContainer lists — TPU steps need static shapes.

test: keep-ratio resize to (1333, 800) -> Pad to a static bucket ->
Normalize; meta carries ori/img shapes and scale factor for host-side
rescaling of results (reference MultiScaleFlipAug, rescale=True).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)


def _resize_image(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    return cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)


def _resize_masks(masks: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Per-mask cv2 nearest resize.  TrainTransform no longer uses this
    (it fuses resize+crop into one gather); kept as the reference
    implementation for the equivalence test and the host profiler."""
    if masks.shape[0] == 0:
        return np.zeros((0, new_h, new_w), np.uint8)
    out = np.stack(
        [
            cv2.resize(m, (new_w, new_h), interpolation=cv2.INTER_NEAREST)
            for m in masks
        ]
    )
    return out


def masks_to_bboxes(masks: np.ndarray) -> np.ndarray:
    boxes = np.zeros((masks.shape[0], 4), np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        if len(xs):
            boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return boxes


@dataclasses.dataclass
class TrainTransform:
    image_size: Tuple[int, int] = (1024, 1024)  # (h, w)
    ratio_range: Tuple[float, float] = (0.1, 2.0)
    flip_prob: float = 0.5
    pad_val: float = 128.0
    mean: np.ndarray = dataclasses.field(default_factory=lambda: IMAGENET_MEAN)
    std: np.ndarray = dataclasses.field(default_factory=lambda: IMAGENET_STD)
    max_instances: int = 100

    def __call__(
        self,
        image: np.ndarray,  # (H, W, 3) RGB uint8/float
        masks: np.ndarray,  # (G, H, W) uint8
        labels: np.ndarray,  # (G,) int
        rng: np.random.RandomState,
    ) -> Dict[str, np.ndarray]:
        # The whole geometric pipeline runs in uint8 — matching the
        # reference, whose mmcv Resize operates on the decoded uint8
        # image with normalization LAST (coco_b48n17.py:195-218), and
        # ~3x cheaper on the 1-core TPU hosts than the former
        # f32-through-resize path (tools/host_profile.py: resize 193 ms
        # f32 vs 57 ms u8 at 1024^2 r=1.6; astype(f32) alone 8 ms).
        img = image if image.dtype == np.uint8 else image.astype(np.uint8)
        th, tw = self.image_size

        # random horizontal flip (contiguous copy: cv2.resize needs it,
        # and a u8 copy is 3x cheaper than the old f32 one)
        if rng.rand() < self.flip_prob:
            img = np.ascontiguousarray(img[:, ::-1])
            masks = masks[:, :, ::-1]

        # large-scale jitter: keep-ratio resize toward ratio * target
        h, w = img.shape[:2]
        ratio = rng.uniform(*self.ratio_range)
        scale = min(th * ratio / h, tw * ratio / w)
        new_h, new_w = max(1, int(h * scale + 0.5)), max(1, int(w * scale + 0.5))
        img = _resize_image(img, new_w, new_h)

        # random crop to target (allow negative / full-bg crops)
        y0 = rng.randint(0, max(new_h - th, 0) + 1)
        x0 = rng.randint(0, max(new_w - tw, 0) + 1)
        img = img[y0 : y0 + th, x0 : x0 + tw]

        # masks: nearest resize + crop fused into ONE gather over all
        # instances — identical to cv2 INTER_NEAREST (src = floor(dst *
        # src/dst), clamped) followed by the crop, but it touches only
        # the cropped window (O(G * crop) instead of O(G * resized):
        # 4x less at ratio 2.0) and replaces the per-mask Python loop
        # (tools/host_profile.py: 775 ms for 8 masks at 1024^2 r=1.6,
        # the dominant stage of the old per-sample cost)
        ch_m = min(th, new_h)
        cw_m = min(tw, new_w)
        if masks.shape[0]:
            src_rows = np.minimum(
                (np.arange(y0, y0 + ch_m) * (h / new_h)).astype(np.intp),
                h - 1,
            )
            src_cols = np.minimum(
                (np.arange(x0, x0 + cw_m) * (w / new_w)).astype(np.intp),
                w - 1,
            )
            masks = masks[:, src_rows[:, None], src_cols[None, :]]
        else:
            masks = np.zeros((0, ch_m, cw_m), np.uint8)

        # filter empty instances (FilterAnnotations by_mask)
        if masks.shape[0]:
            keep = masks.any(axis=(1, 2))
            masks, labels = masks[keep], labels[keep]

        # fused pad + normalize into ONE preallocated f32 output: only
        # the cropped region (<= target size) is ever touched in float,
        # and the pad region takes the normalized pad constant directly
        # (the old path padded u8->f32 full-frame, then ran a whole-
        # image (x - mean) / std with two temporaries)
        ch, cw = img.shape[:2]
        out_img = np.empty((th, tw, 3), np.float32)
        inv_std = 1.0 / self.std
        if ch < th or cw < tw:
            out_img[:] = (self.pad_val - self.mean) * inv_std
        out_img[:ch, :cw] = (img.astype(np.float32) - self.mean) * inv_std

        # fixed-size instance slots
        g = min(masks.shape[0], self.max_instances)
        out_masks = np.zeros((self.max_instances, th, tw), np.uint8)
        out_labels = np.full((self.max_instances,), -1, np.int32)
        if g:
            out_masks[:g, :ch, :cw] = masks[:g]
            out_labels[:g] = labels[:g]
        return {
            "image": out_img,
            "gt_masks": out_masks,
            "gt_labels": out_labels,
            "num_gts": np.int32(g),
        }


@dataclasses.dataclass
class TestTransform:
    scale: Tuple[int, int] = (1333, 800)  # (long, short) keep-ratio target
    pad_bucket: Tuple[int, int] = (800, 1344)  # static (h, w) landscape bucket
    size_divisor: int = 32
    pad_val: float = 128.0
    mean: np.ndarray = dataclasses.field(default_factory=lambda: IMAGENET_MEAN)
    std: np.ndarray = dataclasses.field(default_factory=lambda: IMAGENET_STD)

    def __call__(self, image: np.ndarray) -> Tuple[np.ndarray, Dict]:
        img = image.astype(np.float32)
        h, w = img.shape[:2]
        long_t, short_t = max(self.scale), min(self.scale)
        scale = min(long_t / max(h, w), short_t / min(h, w))
        new_h, new_w = int(h * scale + 0.5), int(w * scale + 0.5)
        img = _resize_image(img, new_w, new_h)

        bh, bw = self.pad_bucket
        if new_h > new_w and bh < bw:  # portrait -> transpose the bucket
            bh, bw = bw, bh
        bh, bw = max(bh, new_h), max(bw, new_w)
        pad = np.full((bh, bw, 3), self.pad_val, np.float32)
        pad[:new_h, :new_w] = img
        pad = (pad - self.mean) / self.std
        meta = {
            "ori_shape": (h, w),
            "img_shape": (new_h, new_w),
            "pad_shape": (bh, bw),
            "scale_factor": scale,
        }
        return pad.astype(np.float32), meta
