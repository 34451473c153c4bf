"""End-to-end OVIS eval protocol test: oracle predictions on a synthetic
dataset must score AP50 = 100 for base, novel and all."""

import json

import numpy as np
import pytest

from betrayed_by_captions_tpu.data.coco import CocoDatasetOpen
from betrayed_by_captions_tpu.evaluation import rle as rle_codec
from betrayed_by_captions_tpu.evaluation.ovis import postprocess_instance_host


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("ovis")
    images, annotations = [], []
    cats = [
        {"id": 1, "name": "person"},
        {"id": 2, "name": "dog"},
        {"id": 3, "name": "cat"},
    ]
    ann_id = 1
    rs = np.random.RandomState(0)
    gt_masks = {}
    for i in range(3):
        h, w = 100, 120
        images.append({"id": i + 1, "height": h, "width": w})
        gt_masks[i + 1] = []
        for j, cat in enumerate([1, 2, 3]):
            y0, x0 = 10 + 25 * j, 15 + 30 * j
            m = np.zeros((h, w), np.uint8)
            m[y0 : y0 + 20, x0 : x0 + 20] = 1
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": cat,
                    "segmentation": rle_codec.encode(m),
                    "bbox": [x0, y0, 20, 20],
                    "area": 400,
                    "iscrowd": 0,
                }
            )
            gt_masks[i + 1].append((cat, m))
            ann_id += 1
    inst_file = str(root / "instances.json")
    with open(inst_file, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations, "categories": cats}, f
        )
    known_file = str(root / "known.txt")
    unknown_file = str(root / "unknown.txt")
    with open(known_file, "w") as f:
        f.write("person\ndog\ncat")
    with open(unknown_file, "w") as f:
        f.write("cat")
    return inst_file, known_file, unknown_file, gt_masks


def oracle_results(gt_masks, name_order, cat_by_name):
    """Perfect predictions in a given bank order."""
    per_image = []
    for img_id in sorted(gt_masks):
        labels, scores, boxes, masks = [], [], [], []
        for cat, m in gt_masks[img_id]:
            name = {1: "person", 2: "dog", 3: "cat"}[cat]
            if name not in name_order:
                continue
            labels.append(name_order.index(name))
            scores.append(0.9)
            ys, xs = np.nonzero(m)
            boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
            masks.append(m.astype(bool))
        per_image.append(
            {
                "labels": np.array(labels),
                "scores": np.array(scores),
                "boxes": np.array(boxes, np.float32),
                "masks": np.array(masks),
            }
        )
    return per_image


class TestOVISProtocol:
    def test_oracle_scores_100(self, fixture):
        inst_file, known_file, unknown_file, gt_masks = fixture
        ds = CocoDatasetOpen(
            inst_file,
            known_file=known_file,
            unknown_file=unknown_file,
            test_mode=True,
        )
        names_all = ["person", "dog", "cat"]
        names_base = ["person", "dog"]
        names_novel = ["cat"]
        results = {
            "all_results": oracle_results(gt_masks, names_all, None),
            "novel_results": oracle_results(gt_masks, names_novel, None),
            "base_results": oracle_results(gt_masks, names_base, None),
        }
        metrics = ds.evaluate(
            results,
            {
                "all_results": names_all,
                "novel_results": names_novel,
                "base_results": names_base,
            },
            metrics=("segm",),
        )
        assert metrics["all_results.segm.ap50_base"] == pytest.approx(100.0)
        assert metrics["all_results.segm.ap50_novel"] == pytest.approx(100.0)
        assert metrics["all_results.segm.ap50_all"] == pytest.approx(100.0)
        assert metrics["novel_results.segm.ap50_novel"] == pytest.approx(100.0)
        assert metrics["base_results.segm.ap50_base"] == pytest.approx(100.0)


class TestHostPostprocess:
    def test_shapes_and_rescale(self):
        rs = np.random.RandomState(0)
        q, d, mh, mw = 10, 8, 32, 48
        cls_emb = rs.randn(q, d)
        logits = rs.randn(q, mh, mw).astype(np.float32) * 3
        bank = np.vstack([rs.randn(4, d), np.zeros((1, d))])
        labels, scores, boxes, masks = postprocess_instance_host(
            cls_emb,
            logits,
            bank,
            img_shape=(100, 160),
            ori_shape=(200, 320),
            pad_shape=(128, 192),
            max_per_image=20,
        )
        assert labels.shape == (20,)
        assert masks.shape == (20, 200, 320)
        assert (scores >= 0).all() and (scores <= 1).all()
        assert (labels < 4).all()
        # scores sorted descending (stable top-k)
        classification = np.sort(scores)[::-1]
        # det scores include mask quality so not strictly sorted; just sane
        assert np.isfinite(scores).all()
