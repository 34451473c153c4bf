"""OVIS/OVOD evaluation: host-side result formatting + COCO protocol with
base/novel/all breakdown.

Mirrors the reference's evaluation path (open_set/datasets/coco_open.py:
format_results :641-716, evaluate_det_segm :474-639, and the fusion head's
rescale ordering maskformer_fusion_head.py:397-414): mask logits are
cropped to the un-padded image, bilinearly resized to the original
resolution, THEN thresholded/scored — order matters for mask AP parity.

Per eval type ('all'/'novel'/'base'), query embeddings are classified
against that bank, top-100 (query, class) pairs are kept, and the 48/17
protocol reports the mean classwise AP at IoU 0.5 over base / novel / all
classes (the reference skips COCOeval.summarize for this split).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.coco_api import COCOJson
from . import rle as rle_codec
from .cocoeval import COCOEvalNative


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def postprocess_instance_host(
    cls_emb: np.ndarray,  # (Q, d) query embeddings
    mask_logits: np.ndarray,  # (Q, h, w) at model output resolution
    bank: np.ndarray,  # (C+1, d) with zero bg row
    img_shape: Tuple[int, int],  # valid (h, w) inside the padded input
    ori_shape: Tuple[int, int],  # original image (h, w)
    pad_shape: Tuple[int, int],  # padded input (h, w)
    max_per_image: int = 100,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (labels, scores, boxes_xyxy, masks) with masks at ori res."""
    import cv2

    q, mh, mw = mask_logits.shape
    # crop padding: model-res masks cover pad_shape
    vh = int(round(mh * img_shape[0] / pad_shape[0]))
    vw = int(round(mw * img_shape[1] / pad_shape[1]))
    logits = mask_logits[:, :vh, :vw]

    scores_full = softmax(cls_emb.astype(np.float64) @ bank.T.astype(np.float64))
    scores = scores_full[:, :-1]
    num_cls = scores.shape[1]
    flat = scores.reshape(-1)
    k = min(max_per_image, flat.size)
    top = np.argpartition(-flat, k - 1)[:k]
    top = top[np.argsort(-flat[top], kind="stable")]
    labels = (top % num_cls).astype(np.int64)
    query_idx = top // num_cls
    top_scores = flat[top]

    oh, ow = ori_shape
    out_masks = np.zeros((k, oh, ow), bool)
    det_scores = np.zeros(k)
    boxes = np.zeros((k, 4), np.float32)
    for i, qi in enumerate(query_idx):
        up = cv2.resize(
            logits[qi].astype(np.float32), (ow, oh), interpolation=cv2.INTER_LINEAR
        )
        binary = up > 0
        prob = 1.0 / (1.0 + np.exp(-up))
        pos = binary.sum()
        mask_score = float((prob * binary).sum() / (pos + 1e-6))
        det_scores[i] = top_scores[i] * mask_score
        out_masks[i] = binary
        ys, xs = np.nonzero(binary)
        if len(xs):
            boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return labels, det_scores, boxes, out_masks


def results_to_coco_json(
    per_image: Sequence[dict],
    img_ids: Sequence[int],
    label_to_cat_id: Sequence[int],
) -> Tuple[List[dict], List[dict]]:
    """Build (segm_results, bbox_results) coco-style dict lists."""
    segm, bbox = [], []
    for img_id, res in zip(img_ids, per_image):
        for label, score, box, mask in zip(
            res["labels"], res["scores"], res["boxes"], res["masks"]
        ):
            cat_id = int(label_to_cat_id[int(label)])
            x1, y1, x2, y2 = [float(v) for v in box]
            entry = {
                "image_id": int(img_id),
                "category_id": cat_id,
                "score": float(score),
            }
            bbox.append({**entry, "bbox": [x1, y1, x2 - x1, y2 - y1]})
            segm.append(
                {**entry, "segmentation": rle_codec.encode(mask.astype(np.uint8))}
            )
    return segm, bbox


def evaluate_coco(
    coco_gt: COCOJson,
    results: List[dict],
    iou_type: str,
    cat_ids: Sequence[int],
    img_ids: Optional[Sequence[int]] = None,
    class_agnostic: bool = False,
    use_summarize: bool = True,
) -> Dict[str, float]:
    """Run the COCO protocol restricted to ``cat_ids`` (reference
    evaluate_det_segm: params.catIds = pred_cats, imgIds = images
    containing those cats)."""
    ev = COCOEvalNative(coco_gt, results, iou_type)
    ev.params.cat_ids = list(cat_ids)
    if img_ids is not None:
        ev.params.img_ids = list(img_ids)
    ev.params.class_agnostic = class_agnostic
    ev.evaluate()
    ev.accumulate()
    out: Dict[str, float] = {}
    if use_summarize:
        stats = ev.summarize()
        for name, val in zip(
            ["mAP", "mAP_50", "mAP_75", "mAP_s", "mAP_m", "mAP_l"], stats[:6]
        ):
            out[name] = float(val)
    out["classwise_ap50"] = ev.classwise_ap50()
    return out


def base_novel_all_summary(
    classwise: Dict[int, float],
    novel_cat_ids: Sequence[int],
    all_cat_ids: Sequence[int],
) -> Dict[str, float]:
    """48/17-split averages of classwise AP50 (reference coco_open.py:618-637)."""
    base_vals, novel_vals = [], []
    novel_set = set(novel_cat_ids)
    for cat_id, ap in classwise.items():
        if cat_id not in all_cat_ids or np.isnan(ap):
            continue
        (novel_vals if cat_id in novel_set else base_vals).append(ap)
    base = float(np.mean(base_vals) * 100) if base_vals else float("nan")
    novel = float(np.mean(novel_vals) * 100) if novel_vals else float("nan")
    both = base_vals + novel_vals
    return {
        "ap50_base": base,
        "ap50_novel": novel,
        "ap50_all": float(np.mean(both) * 100) if both else float("nan"),
    }
