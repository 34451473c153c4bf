"""Host-side open-set panoptic post-processing for the eval loop.

Numpy counterpart of the jittable ``models.fusion_head.
panoptic_postprocess_emb`` (reference maskformer_fusion_head.py:77-159)
operating at original image resolution: crop the padding, bilinear-resize
mask logits to the original size (the reference rescales before
post-processing), then argmax-paste things/stuff segments. Only queries
that pass the keep threshold are resized — discarded queries can never
win the per-pixel argmax, so the result is exact.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

INSTANCE_OFFSET = 1_000_000


def _softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def postprocess_panoptic_host(
    cls_emb: np.ndarray,  # (Q, d) query embeddings
    mask_logits: np.ndarray,  # (Q, h, w) at model output resolution
    bank: np.ndarray,  # (C+1, d) with zero bg row, things first
    num_things_classes: int,
    img_shape: Tuple[int, int],
    ori_shape: Tuple[int, int],
    pad_shape: Tuple[int, int],
    object_mask_thr: float = 0.8,
    iou_thr: float = 0.8,
    filter_low_score: bool = True,
    stuff_area_limit: int = 4096,
) -> np.ndarray:
    """Returns (ori_h, ori_w) int64 panoptic map:
    ``label + instance_id * INSTANCE_OFFSET`` for things, bare label for
    stuff, ``num_bank_classes`` for void."""
    import cv2

    q, mh, mw = mask_logits.shape
    vh = int(round(mh * img_shape[0] / pad_shape[0]))
    vw = int(round(mw * img_shape[1] / pad_shape[1]))
    logits = mask_logits[:, :vh, :vw]

    scores_full = _softmax(cls_emb.astype(np.float64) @ bank.T.astype(np.float64))
    num_classes = scores_full.shape[-1] - 1
    scores = scores_full.max(axis=-1)
    labels = scores_full.argmax(axis=-1)

    keep = (labels != num_classes) & (scores > object_mask_thr)
    oh, ow = ori_shape
    background = np.int64(num_classes)
    if not keep.any():
        return np.full((oh, ow), background, np.int64)

    kept = np.flatnonzero(keep)
    up = np.stack(
        [
            cv2.resize(
                logits[qi].astype(np.float32), (ow, oh),
                interpolation=cv2.INTER_LINEAR,
            )
            for qi in kept
        ]
    )  # (K, oh, ow)
    probs = 1.0 / (1.0 + np.exp(-up))
    weighted = scores[kept, None, None] * probs
    winner = weighted.argmax(axis=0)  # (oh, ow) index into kept

    # two-pass paste (reference maskformer_fusion_head.py:118-158): things
    # first, then stuff into the remaining void. The iou test uses the
    # UNFILTERED winner-region area; filter_low_score shrinks only the
    # pasted thing mask; stuff pastes unfiltered and its area limit
    # applies to the void-restricted region
    panoptic = np.full((oh, ow), background, np.int64)
    instance_id = 0
    stuff_list = []
    for ki, qi in enumerate(kept):
        seg = winner == ki
        mask_area = int(seg.sum())
        original_area = int((probs[ki] >= 0.5).sum())
        if filter_low_score:
            seg = seg & (probs[ki] >= 0.5)
        if (
            mask_area == 0
            or original_area == 0
            or mask_area < iou_thr * original_area
        ):
            continue
        label = int(labels[qi])
        if label < num_things_classes:
            instance_id += 1
            panoptic[seg] = label + instance_id * INSTANCE_OFFSET
        else:
            stuff_list.append(ki)
    for ki in stuff_list:
        seg = (winner == ki) & (panoptic == background)
        if int(seg.sum()) >= stuff_area_limit:
            panoptic[seg] = int(labels[kept[ki]])
    return panoptic
