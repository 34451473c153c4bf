"""Golden tests for the native COCO evaluator: hand-computed AP values on
constructed cases (perfect detections, FPs, crowd, area ranges,
class-agnostic mode)."""

import numpy as np
import pytest

from betrayed_by_captions_tpu.data.coco_api import COCOJson
from betrayed_by_captions_tpu.evaluation import rle as rle_codec
from betrayed_by_captions_tpu.evaluation.cocoeval import COCOEvalNative


def square_mask(h, w, y0, x0, size):
    m = np.zeros((h, w), np.uint8)
    m[y0 : y0 + size, x0 : x0 + size] = 1
    return m


def make_gt(gt_specs, h=100, w=100, cats=(1, 2)):
    """gt_specs: list of (img_id, cat_id, y0, x0, size, iscrowd)."""
    img_ids = sorted({s[0] for s in gt_specs}) or [1]
    dataset = {
        "images": [{"id": i, "height": h, "width": w} for i in img_ids],
        "categories": [{"id": c, "name": f"c{c}"} for c in cats],
        "annotations": [],
    }
    for i, (img, cat, y0, x0, size, crowd) in enumerate(gt_specs):
        mask = square_mask(h, w, y0, x0, size)
        dataset["annotations"].append(
            {
                "id": i + 1,
                "image_id": img,
                "category_id": cat,
                "segmentation": rle_codec.encode(mask),
                "bbox": [x0, y0, size, size],
                "area": int(size * size),
                "iscrowd": crowd,
            }
        )
    return COCOJson(dataset=dataset)


def det(img, cat, y0, x0, size, score, h=100, w=100):
    return {
        "image_id": img,
        "category_id": cat,
        "segmentation": rle_codec.encode(square_mask(h, w, y0, x0, size)),
        "score": score,
    }


class TestBasics:
    def test_perfect_detection_ap1(self):
        gt = make_gt([(1, 1, 10, 10, 20, 0), (1, 2, 50, 50, 20, 0)])
        dts = [det(1, 1, 10, 10, 20, 0.9), det(1, 2, 50, 50, 20, 0.8)]
        ev = COCOEvalNative(gt, dts, "segm")
        ev.evaluate()
        ev.accumulate()
        stats = ev.summarize()
        assert stats[0] == pytest.approx(1.0)
        assert stats[1] == pytest.approx(1.0)

    def test_miss_plus_fp_ap50(self):
        # two gts of one class in one image; one hit + one FP elsewhere
        gt = make_gt([(1, 1, 10, 10, 20, 0), (1, 1, 60, 60, 20, 0)], cats=(1,))
        dts = [det(1, 1, 10, 10, 20, 0.9), det(1, 1, 30, 5, 10, 0.8)]
        ev = COCOEvalNative(gt, dts, "segm")
        ev.evaluate()
        ev.accumulate()
        stats = ev.summarize()
        # precision curve: [1.0@r=0.5, then fp]; 101-pt AP50 = 51/101
        assert stats[1] == pytest.approx(51 / 101, abs=1e-6)

    def test_crowd_neither_helps_nor_hurts(self):
        gt = make_gt(
            [(1, 1, 10, 10, 20, 0), (1, 1, 50, 50, 40, 1)], cats=(1,)
        )
        # dt inside crowd region only
        dts_crowd = [
            det(1, 1, 10, 10, 20, 0.9),
            det(1, 1, 55, 55, 20, 0.8),  # fully inside crowd -> ignored
        ]
        ev = COCOEvalNative(gt, dts_crowd, "segm")
        ev.evaluate()
        ev.accumulate()
        ap_with = ev.summarize()[1]
        ev2 = COCOEvalNative(gt, dts_crowd[:1], "segm")
        ev2.evaluate()
        ev2.accumulate()
        ap_without = ev2.summarize()[1]
        assert ap_with == pytest.approx(ap_without)
        assert ap_with == pytest.approx(1.0)

    def test_bbox_iou_type(self):
        gt = make_gt([(1, 1, 10, 10, 20, 0)], cats=(1,))
        dts = [
            {
                "image_id": 1,
                "category_id": 1,
                "bbox": [10, 10, 20, 20],
                "score": 0.9,
            }
        ]
        ev = COCOEvalNative(gt, dts, "bbox")
        ev.evaluate()
        ev.accumulate()
        assert ev.summarize()[0] == pytest.approx(1.0)

    def test_area_range_ignores(self):
        # a small (20x20=400 px) object: counts in 'small', not 'large'
        gt = make_gt([(1, 1, 10, 10, 20, 0)], cats=(1,))
        dts = [det(1, 1, 10, 10, 20, 0.9)]
        ev = COCOEvalNative(gt, dts, "segm")
        ev.evaluate()
        ev.accumulate()
        stats = ev.summarize()
        assert stats[3] == pytest.approx(1.0)  # AP small
        assert stats[5] == -1.0  # AP large: no gts -> undefined

    def test_classwise_ap50(self):
        gt = make_gt([(1, 1, 10, 10, 20, 0), (1, 2, 50, 50, 20, 0)])
        dts = [det(1, 1, 10, 10, 20, 0.9)]  # only class 1 predicted
        ev = COCOEvalNative(gt, dts, "segm")
        ev.evaluate()
        ev.accumulate()
        per_class = ev.classwise_ap50()
        assert per_class[1] == pytest.approx(1.0)
        assert per_class[2] == pytest.approx(0.0)


class TestClassAgnostic:
    def test_agnostic_dts_match_all_categories(self):
        gt = make_gt([(1, 1, 10, 10, 20, 0), (1, 2, 50, 50, 20, 0)])
        # all detections under category 1 (class-agnostic convention)
        dts = [det(1, 1, 10, 10, 20, 0.9), det(1, 1, 50, 50, 20, 0.8)]
        ev = COCOEvalNative(gt, dts, "segm")
        ev.params.class_agnostic = True
        ev.evaluate()
        ev.accumulate()
        stats = ev.summarize()
        # both gts found by agnostic dts; the unmatched dt in each class
        # costs precision but AP50 per class stays high
        assert stats[1] > 0.5
