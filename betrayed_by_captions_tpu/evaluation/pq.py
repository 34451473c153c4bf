"""Open-set panoptic quality (PQ) evaluation.

Reimplementation of the reference's open-set PQ evaluator
(open_set/utils/eval/pq_evaluation.py:17-193 — itself a panopticapi
extension) with:

- PQ/SQ/RQ plus per-class precision/recall,
- ``pq_average(isthing, isunknown, unknown_cat_ids)`` splits:
  Known Things / Unknown Things / Stuff (the OSPS table axes),
- segment matching identical to panopticapi: same-category segments with
  IoU > 0.5 where the union excludes the prediction's VOID overlap; crowd
  gts ignored; unmatched predictions mostly covered by VOID/crowd ignored,
- per-image computation on id maps (arrays) with a multiprocess driver
  for file-based evaluation.
"""

from __future__ import annotations

from collections import defaultdict
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

VOID = 0
_OFFSET = 256 ** 3


class PQStatCat:
    __slots__ = ("iou", "tp", "fp", "fn")

    def __init__(self):
        self.iou = 0.0
        self.tp = 0
        self.fp = 0
        self.fn = 0

    def __iadd__(self, other: "PQStatCat"):
        self.iou += other.iou
        self.tp += other.tp
        self.fp += other.fp
        self.fn += other.fn
        return self


class PQStat:
    def __init__(self):
        self.per_cat: Dict[int, PQStatCat] = defaultdict(PQStatCat)

    def __getitem__(self, cat: int) -> PQStatCat:
        return self.per_cat[cat]

    def __iadd__(self, other: "PQStat"):
        for cat, stat in other.per_cat.items():
            self.per_cat[cat] += stat
        return self

    def pq_average(
        self,
        categories: Dict[int, dict],
        isthing: Optional[bool] = None,
        isunknown: Optional[bool] = None,
        unknown_cat_ids: Sequence[int] = (),
    ) -> Tuple[Dict[str, float], Dict[int, dict]]:
        """Averages over a category subset (reference pq_average, :46-86)."""
        unknown = set(unknown_cat_ids)
        agg = dict(pq=0.0, sq=0.0, rq=0.0, precision=0.0, recall=0.0)
        n = 0
        per_class: Dict[int, dict] = {}
        for cat_id, info in categories.items():
            if isthing is not None and bool(info["isthing"]) != isthing:
                continue
            if isunknown is not None and (cat_id in unknown) != isunknown:
                continue
            s = self.per_cat[cat_id]
            total = s.tp + s.fp + s.fn
            if total == 0:
                per_class[cat_id] = dict(pq=0.0, sq=0.0, rq=0.0, precision=0.0, recall=0.0)
                continue
            res = dict(
                pq=s.iou / (s.tp + 0.5 * s.fp + 0.5 * s.fn),
                sq=s.iou / s.tp if s.tp else 0.0,
                rq=s.tp / (s.tp + 0.5 * s.fp + 0.5 * s.fn),
                precision=s.tp / (s.tp + s.fp) if (s.tp + s.fp) else 0.0,
                recall=s.tp / (s.tp + s.fn) if (s.tp + s.fn) else 0.0,
            )
            per_class[cat_id] = res
            n += 1
            for k in agg:
                agg[k] += res[k]
        if n == 0:
            return dict(pq=0.0, sq=0.0, rq=0.0, n=0, precision=0.0, recall=0.0), per_class
        out = {k: v / n for k, v in agg.items()}
        out["n"] = n
        return out, per_class


def pq_compute_image(
    pan_gt: np.ndarray,  # (H, W) int segment ids
    pan_pred: np.ndarray,  # (H, W) int segment ids
    gt_segments: Sequence[dict],  # {'id', 'category_id', 'iscrowd'(, 'area')}
    pred_segments: Sequence[dict],  # {'id', 'category_id'}
) -> PQStat:
    """PQ statistics for one image (reference pq_compute_single_core)."""
    stat = PQStat()
    gt_segms = {s["id"]: dict(s) for s in gt_segments}
    pred_segms = {s["id"]: dict(s) for s in pred_segments}

    # areas from the maps (predictions must cover their declared ids)
    labels, counts = np.unique(pan_pred, return_counts=True)
    for label, cnt in zip(labels, counts):
        if label == VOID:
            continue
        if int(label) not in pred_segms:
            raise KeyError(f"segment {label} in PNG but not in segments_info")
        pred_segms[int(label)]["area"] = int(cnt)
    for seg_id in list(pred_segms):
        pred_segms[seg_id].setdefault("area", 0)
    labels, counts = np.unique(pan_gt, return_counts=True)
    for label, cnt in zip(labels, counts):
        if int(label) in gt_segms:
            gt_segms[int(label)]["area"] = int(cnt)
    for seg_id in list(gt_segms):
        gt_segms[seg_id].setdefault("area", 0)

    # joint confusion counts
    combined = pan_gt.astype(np.uint64) * _OFFSET + pan_pred.astype(np.uint64)
    labels, counts = np.unique(combined, return_counts=True)
    inter: Dict[Tuple[int, int], int] = {}
    for label, cnt in zip(labels, counts):
        inter[(int(label // _OFFSET), int(label % _OFFSET))] = int(cnt)

    gt_matched, pred_matched = set(), set()
    for (gt_id, pred_id), intersection in inter.items():
        if gt_id not in gt_segms or pred_id not in pred_segms:
            continue
        g, p = gt_segms[gt_id], pred_segms[pred_id]
        if g.get("iscrowd", 0) == 1:
            continue
        if g["category_id"] != p["category_id"]:
            continue
        union = (
            p["area"] + g["area"] - intersection - inter.get((VOID, pred_id), 0)
        )
        iou = intersection / union if union > 0 else 0.0
        if iou > 0.5:
            cat = g["category_id"]
            stat[cat].tp += 1
            stat[cat].iou += iou
            gt_matched.add(gt_id)
            pred_matched.add(pred_id)

    crowd_by_cat: Dict[int, int] = {}
    for gt_id, g in gt_segms.items():
        if gt_id in gt_matched:
            continue
        if g.get("iscrowd", 0) == 1:
            crowd_by_cat[g["category_id"]] = gt_id
            continue
        stat[g["category_id"]].fn += 1

    for pred_id, p in pred_segms.items():
        if pred_id in pred_matched:
            continue
        ignored = inter.get((VOID, pred_id), 0)
        if p["category_id"] in crowd_by_cat:
            ignored += inter.get((crowd_by_cat[p["category_id"]], pred_id), 0)
        if p["area"] > 0 and ignored / p["area"] > 0.5:
            continue
        stat[p["category_id"]].fp += 1
    return stat


def _compute_from_files(args) -> PQStat:
    import PIL.Image as Image

    from ..data.panoptic_codec import rgb2id

    gt_path, pred_path, gt_segments, pred_segments = args
    pan_gt = rgb2id(np.array(Image.open(gt_path), dtype=np.uint8))
    pan_pred = rgb2id(np.array(Image.open(pred_path), dtype=np.uint8))
    return pq_compute_image(pan_gt, pan_pred, gt_segments, pred_segments)


def pq_compute_multi_core(
    matched: List[Tuple[str, str, Sequence[dict], Sequence[dict]]],
    num_workers: int = 8,
) -> PQStat:
    """File-based parallel PQ (reference pq_compute_multi_core, :180-193).

    ``matched``: per image (gt_png_path, pred_png_path, gt_segments,
    pred_segments).
    """
    total = PQStat()
    if num_workers <= 1 or len(matched) < 4:
        for item in matched:
            total += _compute_from_files(item)
        return total
    with ProcessPoolExecutor(num_workers) as pool:
        for stat in pool.map(_compute_from_files, matched, chunksize=8):
            total += stat
    return total
