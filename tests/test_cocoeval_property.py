"""Randomized property test: COCOEvalNative vs a brute-force AP oracle.

The COCO AP pipeline has notorious edge cases — score-tie ordering,
101-point interpolation boundaries, maxDets truncation order, crowd +
area-range interactions (reference semantics:
/root/reference/open_set/utils/eval/cocoeval.py:97-100,170-173,252-255).
This file checks the vectorized evaluator against ``OracleEval``: a
deliberately naive, loop-everything implementation of the published COCO
algorithm that shares no code with the production evaluator —
per-detection greedy matching with plain Python loops, running TP/FP
counters instead of cumsum, and 101-point interpolation computed directly
as max-precision-over-recall>=r instead of envelope + searchsorted.

Random cases draw scores from a small discrete set (forcing ties), mix
crowd gts, tight area ranges, maxDets in {1, 2, 100}, empty images, and
the class-agnostic mode.
"""

import numpy as np
import pytest

from betrayed_by_captions_tpu.data.coco_api import COCOJson
from betrayed_by_captions_tpu.evaluation.cocoeval import COCOEvalNative

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)


def bbox_iou(d, g, crowd):
    """Plain-formula box IoU; crowd gt uses dt area as the union."""
    dx1, dy1, dw, dh = d
    gx1, gy1, gw, gh = g
    ix = max(0.0, min(dx1 + dw, gx1 + gw) - max(dx1, gx1))
    iy = max(0.0, min(dy1 + dh, gy1 + gh) - max(dy1, gy1))
    inter = ix * iy
    union = dw * dh if crowd else dw * dh + gw * gh - inter
    return inter / union if union > 0 else 0.0


class OracleEval:
    """Brute-force COCO AP over (iou_thr, cat, area_rng, max_det)."""

    def __init__(self, gts, dts, img_ids, cat_ids, area_rng, max_dets,
                 class_agnostic=False, agnostic_cat=1):
        self.gts = gts  # list of dicts: image_id, category_id, bbox, area, iscrowd
        self.dts = dts  # list of dicts: image_id, category_id, bbox, area, score
        self.img_ids = img_ids
        self.cat_ids = cat_ids
        self.area_rng = area_rng
        self.max_dets = max_dets
        self.class_agnostic = class_agnostic
        self.agnostic_cat = agnostic_cat

    def _match_one_image(self, img_id, cat_id, arng, max_det, thr):
        """Returns (records, num_gt): records = list of (score, tp, ignored)
        per kept detection in score order."""
        gts = [g for g in self.gts
               if g["image_id"] == img_id and g["category_id"] == cat_id]
        dt_cat = self.agnostic_cat if self.class_agnostic else cat_id
        dts = [d for d in self.dts
               if d["image_id"] == img_id and d["category_id"] == dt_cat]
        dts = sorted(dts, key=lambda d: -d["score"])  # stable
        dts = dts[:max_det]

        for g in gts:
            g_ignored = bool(g.get("iscrowd", 0)) or not (
                arng[0] <= g["area"] <= arng[1]
            )
            g["_ig"] = g_ignored
        # ignored gts go last (stable)
        gts = [g for g in gts if not g["_ig"]] + [g for g in gts if g["_ig"]]

        matched_gt = [False] * len(gts)
        records = []
        for d in dts:
            best, best_iou = None, min(thr, 1 - 1e-10)
            for gi, g in enumerate(gts):
                if matched_gt[gi] and not g.get("iscrowd", 0):
                    continue
                if best is not None and not gts[best]["_ig"] and g["_ig"]:
                    break  # a real match exists; never trade it for ignored
                iou = bbox_iou(d["bbox"], g["bbox"], g.get("iscrowd", 0))
                if iou < best_iou:
                    continue
                best_iou = iou
                best = gi
            if best is not None:
                matched_gt[best] = True
                records.append((d["score"], True, gts[best]["_ig"]))
            else:
                d_out = not (arng[0] <= d["area"] <= arng[1])
                records.append((d["score"], False, d_out))
        num_gt = sum(1 for g in gts if not g["_ig"])
        return records, num_gt

    def ap_and_recall(self, thr, cat_id, arng, max_det):
        """(AP, recall) or (None, None) when the cell is undefined
        (no gts anywhere for this class/area)."""
        all_records, total_gt, any_img = [], 0, False
        for img_id in self.img_ids:
            has_gt = any(g["image_id"] == img_id and g["category_id"] == cat_id
                         for g in self.gts)
            dt_cat = self.agnostic_cat if self.class_agnostic else cat_id
            has_dt = any(d["image_id"] == img_id and d["category_id"] == dt_cat
                         for d in self.dts)
            if not has_gt and not has_dt:
                continue  # image contributes nothing (evaluate_img -> None)
            any_img = True
            recs, n = self._match_one_image(img_id, cat_id, arng, max_det, thr)
            all_records.extend(recs)
            total_gt += n
        if not any_img or total_gt == 0:
            return None, None
        # global stable score sort across images (image order preserved
        # within ties exactly as the concatenation order)
        scores = np.array([r[0] for r in all_records])
        order = np.argsort(-scores, kind="stable")
        tp_run = fp_run = 0
        rc, pr = [], []
        for i in order:
            score, tp, ignored = all_records[i]
            if ignored:
                continue
            if tp:
                tp_run += 1
            else:
                fp_run += 1
            rc.append(tp_run / total_gt)
            pr.append(tp_run / (tp_run + fp_run + np.spacing(1)))
        if not rc:
            return 0.0, 0.0
        # 101-point interpolation, the naive way
        ap = 0.0
        for r in REC_THRS:
            cands = [p for p, rcv in zip(pr, rc) if rcv >= r]
            ap += max(cands) if cands else 0.0
        return ap / len(REC_THRS), rc[-1]

    def mean_ap(self, thr_idx=None, area_idx=0, maxdet_idx=None):
        """Mean over classes (and thresholds when thr_idx None) of defined
        cells — the summarize() semantics."""
        mi = len(self.max_dets) - 1 if maxdet_idx is None else maxdet_idx
        thrs = IOU_THRS if thr_idx is None else [IOU_THRS[thr_idx]]
        vals = []
        for thr in thrs:
            for c in self.cat_ids:
                ap, _ = self.ap_and_recall(
                    thr, c, self.area_rng[area_idx], self.max_dets[mi]
                )
                if ap is not None:
                    vals.append(ap)
        return float(np.mean(vals)) if vals else -1.0

    def mean_recall(self, area_idx=0, maxdet_idx=None):
        mi = len(self.max_dets) - 1 if maxdet_idx is None else maxdet_idx
        vals = []
        for thr in IOU_THRS:
            for c in self.cat_ids:
                _, rec = self.ap_and_recall(
                    thr, c, self.area_rng[area_idx], self.max_dets[mi]
                )
                if rec is not None:
                    vals.append(rec)
        return float(np.mean(vals)) if vals else -1.0


def random_case(rs, n_imgs=3, n_cats=2, class_agnostic=False):
    """Random small detection problem on a 64x64 canvas with score ties."""
    images = [{"id": i + 1, "height": 64, "width": 64} for i in range(n_imgs)]
    cats = [{"id": c + 1, "name": f"c{c}"} for c in range(n_cats)]
    score_pool = [0.1, 0.3, 0.5, 0.7, 0.9]  # small set -> frequent ties

    def rand_box():
        w = int(rs.randint(2, 20))
        h = int(rs.randint(2, 20))
        x = int(rs.randint(0, 64 - w))
        y = int(rs.randint(0, 64 - h))
        return [float(x), float(y), float(w), float(h)]

    gts, ann_id = [], 1
    for img in images:
        for _ in range(rs.randint(0, 4)):
            box = rand_box()
            gts.append({
                "id": ann_id,
                "image_id": img["id"],
                "category_id": int(rs.randint(1, n_cats + 1)),
                "bbox": box,
                "area": box[2] * box[3],
                "iscrowd": int(rs.rand() < 0.2),
            })
            ann_id += 1

    dts = []
    for img in images:
        for _ in range(rs.randint(0, 6)):
            # half the detections perturb a gt box (plausible overlaps)
            img_gts = [g for g in gts if g["image_id"] == img["id"]]
            if img_gts and rs.rand() < 0.5:
                src = img_gts[rs.randint(len(img_gts))]["bbox"]
                box = [
                    max(0.0, src[0] + rs.randint(-3, 4)),
                    max(0.0, src[1] + rs.randint(-3, 4)),
                    max(2.0, src[2] + rs.randint(-3, 4)),
                    max(2.0, src[3] + rs.randint(-3, 4)),
                ]
            else:
                box = rand_box()
            cat = 1 if class_agnostic else int(rs.randint(1, n_cats + 1))
            dts.append({
                "image_id": img["id"],
                "category_id": cat,
                "bbox": box,
                "area": box[2] * box[3],
                "score": float(score_pool[rs.randint(len(score_pool))]),
            })

    gt_json = {"images": images, "annotations": gts, "categories": cats}
    return gt_json, gts, dts


AREA_RNG = [
    [0.0, 1e10],
    [0.0, 36.0],     # tight ranges that real boxes actually straddle
    [36.0, 144.0],
    [144.0, 1e10],
]
MAX_DETS = [1, 2, 100]


def run_native(gt_json, dts, class_agnostic):
    ev = COCOEvalNative(COCOJson(dataset=gt_json), dts, "bbox")
    ev.params.area_rng = AREA_RNG
    ev.params.area_rng_lbl = ["all", "small", "medium", "large"]
    ev.params.max_dets = MAX_DETS
    ev.params.class_agnostic = class_agnostic
    ev.evaluate()
    ev.accumulate()
    return ev


class TestCocoEvalProperty:
    @pytest.mark.parametrize("trial", range(24))
    def test_matches_oracle(self, trial):
        rs = np.random.RandomState(1000 + trial)
        class_agnostic = trial % 4 == 3
        gt_json, gts, dts = random_case(rs, class_agnostic=class_agnostic)
        if not gts and not dts:
            return
        ev = run_native(gt_json, dts, class_agnostic)
        oracle = OracleEval(
            [dict(g) for g in gts], dts,
            img_ids=sorted(i["id"] for i in gt_json["images"]),
            cat_ids=sorted(c["id"] for c in gt_json["categories"]),
            area_rng=AREA_RNG, max_dets=MAX_DETS,
            class_agnostic=class_agnostic,
        )
        stats = ev.summarize()
        want = [
            oracle.mean_ap(),                       # AP
            oracle.mean_ap(thr_idx=0),              # AP50
            oracle.mean_ap(thr_idx=5),              # AP75
            oracle.mean_ap(area_idx=1),             # AP small
            oracle.mean_ap(area_idx=2),             # AP medium
            oracle.mean_ap(area_idx=3),             # AP large
            oracle.mean_recall(maxdet_idx=0),
            oracle.mean_recall(maxdet_idx=1),
            oracle.mean_recall(maxdet_idx=2),
            oracle.mean_recall(area_idx=1),
            oracle.mean_recall(area_idx=2),
            oracle.mean_recall(area_idx=3),
        ]
        np.testing.assert_allclose(
            stats, want, atol=1e-9,
            err_msg=f"trial {trial} agnostic={class_agnostic}\n"
                    f"gts={gts}\ndts={dts}",
        )

    def test_score_tie_ordering(self):
        """All-equal scores: AP must follow the concatenation (image)
        order deterministically — a stable-sort regression canary."""
        images = [{"id": 1, "height": 64, "width": 64},
                  {"id": 2, "height": 64, "width": 64}]
        cats = [{"id": 1, "name": "c0"}]
        gts = [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [0, 0, 10, 10], "area": 100.0, "iscrowd": 0},
            {"id": 2, "image_id": 2, "category_id": 1,
             "bbox": [0, 0, 10, 10], "area": 100.0, "iscrowd": 0},
        ]
        dts = [
            # image 2's FP listed first but same score: image-1 dt (TP)
            # must still precede it after the stable global sort
            {"image_id": 2, "category_id": 1, "bbox": [40, 40, 10, 10],
             "area": 100.0, "score": 0.5},
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10],
             "area": 100.0, "score": 0.5},
            {"image_id": 2, "category_id": 1, "bbox": [0, 0, 10, 10],
             "area": 100.0, "score": 0.5},
        ]
        gt_json = {"images": images, "annotations": gts, "categories": cats}
        ev = run_native(gt_json, dts, False)
        oracle = OracleEval(gts, dts, [1, 2], [1], AREA_RNG, MAX_DETS)
        stats = ev.summarize()
        assert stats[0] == pytest.approx(oracle.mean_ap(), abs=1e-9)

    def test_crowd_absorbs_multiple_detections(self):
        """Two detections on one crowd gt: both ignored, AP driven only by
        the non-crowd gt."""
        images = [{"id": 1, "height": 64, "width": 64}]
        cats = [{"id": 1, "name": "c0"}]
        gts = [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [0, 0, 20, 20], "area": 400.0, "iscrowd": 1},
            {"id": 2, "image_id": 1, "category_id": 1,
             "bbox": [40, 40, 10, 10], "area": 100.0, "iscrowd": 0},
        ]
        dts = [
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10],
             "area": 100.0, "score": 0.9},
            {"image_id": 1, "category_id": 1, "bbox": [10, 10, 10, 10],
             "area": 100.0, "score": 0.8},
            {"image_id": 1, "category_id": 1, "bbox": [40, 40, 10, 10],
             "area": 100.0, "score": 0.7},
        ]
        gt_json = {"images": images, "annotations": gts, "categories": cats}
        ev = run_native(gt_json, dts, False)
        stats = ev.summarize()
        oracle = OracleEval(gts, dts, [1], [1], AREA_RNG, MAX_DETS)
        np.testing.assert_allclose(stats[0], oracle.mean_ap(), atol=1e-9)
        assert stats[0] == pytest.approx(1.0)  # crowd dts ignored, gt 2 hit
