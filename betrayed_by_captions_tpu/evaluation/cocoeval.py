"""COCO detection/segmentation evaluator (clean-room numpy implementation).

Replaces the reference's vendored pycocotools COCOeval with its
class-agnostic extension (open_set/utils/eval/cocoeval.py: agnostic
detections stored under one category are matched against every gt
category, :97-100,170-173,252-255) — pycocotools is unavailable here, so
the standard COCO matching/accumulation algorithm is reimplemented from
its published semantics:

- greedy per-image matching of score-sorted detections to gts per IoU
  threshold, crowd gts can absorb multiple detections, ignored gts sort
  last and matched-to-ignored detections are excluded,
- precision/recall accumulation on a 101-point recall grid over
  (iou_thr, class, area_range, max_dets),
- the standard 12 summary statistics.

Mask IoU uses the native RLE codec (evaluation/rle.py).
"""

from __future__ import annotations

import copy
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from . import rle as rle_codec


class DetEvalParams:
    def __init__(self, iou_type: str = "segm"):
        self.iou_type = iou_type
        self.img_ids: List[int] = []
        self.cat_ids: List[int] = []
        self.iou_thrs = np.linspace(0.5, 0.95, 10)
        self.rec_thrs = np.linspace(0.0, 1.0, 101)
        self.max_dets = [1, 10, 100]
        self.area_rng = [
            [0.0, 1e10],
            [0.0, 32.0 ** 2],
            [32.0 ** 2, 96.0 ** 2],
            [96.0 ** 2, 1e10],
        ]
        self.area_rng_lbl = ["all", "small", "medium", "large"]
        self.use_cats = True
        self.class_agnostic = False
        self.agnostic_cat = 1  # detections live under this category id


def results_to_index(results: Sequence[dict]) -> Dict:
    """Index detection results (list of coco-style result dicts) by
    (image_id, category_id)."""
    by_img_cat = defaultdict(list)
    for i, r in enumerate(results):
        r = dict(r)
        r.setdefault("id", i + 1)
        if "segmentation" in r and "area" not in r:
            r["area"] = rle_codec.area(r["segmentation"])
        elif "bbox" in r and "area" not in r:
            r["area"] = float(r["bbox"][2] * r["bbox"][3])
        by_img_cat[(r["image_id"], r["category_id"])].append(r)
    return by_img_cat


class COCOEvalNative:
    def __init__(self, coco_gt, results: Sequence[dict], iou_type: str = "segm"):
        """coco_gt: data.coco_api.COCOJson of the ground truth."""
        self.coco_gt = coco_gt
        self.params = DetEvalParams(iou_type)
        self.params.img_ids = sorted(coco_gt.get_img_ids())
        self.params.cat_ids = sorted(coco_gt.get_cat_ids())
        self._results = list(results)
        self.eval: Dict = {}
        self.stats: Optional[np.ndarray] = None

    # ---------------------------------------------------------- prepare
    def _gt_to_rle(self, ann, img_info):
        h, w = img_info["height"], img_info["width"]
        return rle_codec.encode(
            rle_codec.segmentation_to_mask(ann["segmentation"], h, w)
        )

    def _prepare(self):
        p = self.params
        img_set = set(p.img_ids)
        self._gts = defaultdict(list)
        for ann in self.coco_gt.anns.values():
            if ann["image_id"] not in img_set:
                continue
            if p.use_cats and ann["category_id"] not in set(p.cat_ids):
                continue
            g = dict(ann)
            g["ignore"] = g.get("ignore", 0) or g.get("iscrowd", 0)
            if p.iou_type == "segm":
                img_info = self.coco_gt.imgs[ann["image_id"]]
                g["segmentation"] = self._gt_to_rle(g, img_info)
            self._gts[(g["image_id"], g["category_id"])].append(g)

        self._dts = results_to_index(
            [r for r in self._results if r["image_id"] in img_set]
        )

    def _get_dts(self, img_id, cat_id):
        p = self.params
        if p.class_agnostic:
            return self._dts.get((img_id, p.agnostic_cat), [])
        return self._dts.get((img_id, cat_id), [])

    # -------------------------------------------------------------- IoU
    def _compute_iou(self, img_id, cat_id):
        p = self.params
        gt = self._gts.get((img_id, cat_id), [])
        dt = sorted(self._get_dts(img_id, cat_id), key=lambda d: -d["score"])
        dt = dt[: p.max_dets[-1]]
        if not gt or not dt:
            return np.zeros((len(dt), len(gt)))
        iscrowd = [int(g.get("iscrowd", 0)) for g in gt]
        if p.iou_type == "segm":
            return rle_codec.iou(
                [d["segmentation"] for d in dt],
                [g["segmentation"] for g in gt],
                iscrowd,
            )
        return rle_codec.iou(
            np.array([d["bbox"] for d in dt], np.float64),
            np.array([g["bbox"] for g in gt], np.float64),
            iscrowd,
        )

    # ------------------------------------------------------ per-image eval
    def _evaluate_img(self, img_id, cat_id, area_rng, max_det, ious):
        p = self.params
        gt = self._gts.get((img_id, cat_id), [])
        dt = sorted(self._get_dts(img_id, cat_id), key=lambda d: -d["score"])
        dt = dt[:max_det]
        if not gt and not dt:
            return None

        gt_ignore_flags = np.array(
            [
                1
                if (g["ignore"] or g["area"] < area_rng[0] or g["area"] > area_rng[1])
                else 0
                for g in gt
            ],
            np.int32,
        )
        gt_order = np.argsort(gt_ignore_flags, kind="stable")
        gt = [gt[i] for i in gt_order]
        gt_ig = gt_ignore_flags[gt_order]
        iscrowd = [int(g.get("iscrowd", 0)) for g in gt]
        ious_sorted = (
            ious[:, gt_order] if len(ious) else np.zeros((len(dt), len(gt)))
        )

        t_count = len(p.iou_thrs)
        gtm = np.zeros((t_count, len(gt)), np.int64)
        dtm = np.zeros((t_count, len(dt)), np.int64)
        dt_ig = np.zeros((t_count, len(dt)), np.int32)
        for ti, thr in enumerate(p.iou_thrs):
            for di, d in enumerate(dt):
                best_iou = min(thr, 1 - 1e-10)
                best = -1
                for gi in range(len(gt)):
                    if gtm[ti, gi] > 0 and not iscrowd[gi]:
                        continue
                    # gts sorted ignore-last; stop at ignored if matched
                    if best > -1 and gt_ig[best] == 0 and gt_ig[gi] == 1:
                        break
                    if ious_sorted[di, gi] < best_iou:
                        continue
                    best_iou = ious_sorted[di, gi]
                    best = gi
                if best == -1:
                    continue
                dt_ig[ti, di] = gt_ig[best]
                dtm[ti, di] = gt[best]["id"]
                gtm[ti, best] = d["id"]

        # unmatched dts outside the area range are ignored
        dt_out = np.array(
            [
                d["area"] < area_rng[0] or d["area"] > area_rng[1]
                for d in dt
            ],
            bool,
        )
        dt_ig = np.logical_or(
            dt_ig, np.logical_and(dtm == 0, np.tile(dt_out, (t_count, 1)))
        )
        return {
            "dt_matches": dtm,
            "dt_scores": np.array([d["score"] for d in dt]),
            "dt_ignore": dt_ig,
            "gt_ignore": gt_ig,
            "num_gt": int((gt_ig == 0).sum()),
        }

    # ------------------------------------------------------------ evaluate
    def evaluate(self):
        p = self.params
        self._prepare()
        cat_ids = p.cat_ids if p.use_cats else [-1]
        self._ious = {
            (i, c): self._compute_iou(i, c) for i in p.img_ids for c in cat_ids
        }
        max_det = p.max_dets[-1]
        self._eval_imgs = {
            (i, c, a): self._evaluate_img(
                i, c, p.area_rng[a], max_det, self._ious[(i, c)]
            )
            for c in cat_ids
            for a in range(len(p.area_rng))
            for i in p.img_ids
        }
        self._params_eval = copy.deepcopy(p)

    # ---------------------------------------------------------- accumulate
    def accumulate(self):
        p = self._params_eval
        t_n, r_n = len(p.iou_thrs), len(p.rec_thrs)
        k_n, a_n, m_n = len(p.cat_ids), len(p.area_rng), len(p.max_dets)
        precision = -np.ones((t_n, r_n, k_n, a_n, m_n))
        recall = -np.ones((t_n, k_n, a_n, m_n))
        scores = -np.ones((t_n, r_n, k_n, a_n, m_n))

        for ki, cat_id in enumerate(p.cat_ids):
            for ai in range(a_n):
                evals = [
                    self._eval_imgs.get((i, cat_id, ai)) for i in p.img_ids
                ]
                evals = [e for e in evals if e is not None]
                if not evals:
                    continue
                for mi, max_det in enumerate(p.max_dets):
                    dt_scores = np.concatenate(
                        [e["dt_scores"][:max_det] for e in evals]
                    )
                    order = np.argsort(-dt_scores, kind="stable")
                    sorted_scores = dt_scores[order]
                    dtm = np.concatenate(
                        [e["dt_matches"][:, :max_det] for e in evals], axis=1
                    )[:, order]
                    dt_ig = np.concatenate(
                        [e["dt_ignore"][:, :max_det] for e in evals], axis=1
                    )[:, order]
                    num_gt = sum(e["num_gt"] for e in evals)
                    if num_gt == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dt_ig))
                    fps = np.logical_and(
                        np.logical_not(dtm), np.logical_not(dt_ig)
                    )
                    tp_sum = np.cumsum(tps, axis=1).astype(float)
                    fp_sum = np.cumsum(fps, axis=1).astype(float)
                    for ti in range(t_n):
                        tp, fp = tp_sum[ti], fp_sum[ti]
                        rc = tp / num_gt
                        pr = tp / (tp + fp + np.spacing(1))
                        recall[ti, ki, ai, mi] = rc[-1] if len(rc) else 0
                        # precision envelope (monotone decreasing)
                        pr = pr.tolist()
                        for i in range(len(pr) - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, p.rec_thrs, side="left")
                        q = np.zeros(r_n)
                        ss = np.zeros(r_n)
                        for ri, pi in enumerate(inds):
                            if pi < len(pr):
                                q[ri] = pr[pi]
                                ss[ri] = sorted_scores[pi]
                        precision[ti, :, ki, ai, mi] = q
                        scores[ti, :, ki, ai, mi] = ss

        self.eval = {
            "params": p,
            "counts": [t_n, r_n, k_n, a_n, m_n],
            "precision": precision,
            "recall": recall,
            "scores": scores,
        }

    # ------------------------------------------------------------ summarize
    def _summarize_one(self, ap=1, iou_thr=None, area="all", max_dets=100):
        p = self._params_eval
        ai = p.area_rng_lbl.index(area)
        mi = p.max_dets.index(max_dets)
        if ap:
            s = self.eval["precision"]
            if iou_thr is not None:
                ti = int(np.argwhere(np.isclose(p.iou_thrs, iou_thr))[0, 0])
                s = s[ti : ti + 1]
            s = s[:, :, :, ai, mi]
        else:
            s = self.eval["recall"]
            if iou_thr is not None:
                ti = int(np.argwhere(np.isclose(p.iou_thrs, iou_thr))[0, 0])
                s = s[ti : ti + 1]
            s = s[:, :, ai, mi]
        valid = s[s > -1]
        return float(np.mean(valid)) if valid.size else -1.0

    def summarize(self) -> np.ndarray:
        s = self._summarize_one
        self.stats = np.array(
            [
                s(1),
                s(1, 0.5),
                s(1, 0.75),
                s(1, area="small"),
                s(1, area="medium"),
                s(1, area="large"),
                s(0, max_dets=self.params.max_dets[0]),
                s(0, max_dets=self.params.max_dets[1]),
                s(0, max_dets=self.params.max_dets[2]),
                s(0, area="small"),
                s(0, area="medium"),
                s(0, area="large"),
            ]
        )
        return self.stats

    # ------------------------------------------- classwise AP50 protocol
    def classwise_ap50(self) -> Dict[int, float]:
        """Per-class mean precision at IoU 0.5, area all, max dets 100 —
        the reference's 48/17 protocol (coco_open.py:585-637 averages
        precision[0, :, idx, 0, -1] over valid recall points)."""
        p = self._params_eval
        out = {}
        for ki, cat_id in enumerate(p.cat_ids):
            pr = self.eval["precision"][0, :, ki, 0, -1]
            pr = pr[pr > -1]
            out[cat_id] = float(np.mean(pr)) if pr.size else float("nan")
        return out
