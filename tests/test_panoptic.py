"""Panoptic path tests: codec, PQ evaluator golden values, open-set splits,
and the panoptic dataset GT/eval pipeline on a synthetic fixture."""

import json
import os

import numpy as np
import pytest

from betrayed_by_captions_tpu.data.panoptic_codec import id2rgb, rgb2id
from betrayed_by_captions_tpu.evaluation.pq import PQStat, pq_compute_image


class TestCodec:
    def test_roundtrip(self):
        rs = np.random.RandomState(0)
        ids = rs.randint(0, 256 ** 3, (20, 30))
        np.testing.assert_array_equal(rgb2id(id2rgb(ids)), ids)


class TestPQ:
    def make_maps(self):
        gt = np.zeros((100, 100), np.int64)
        gt[:50, :] = 1  # cat 1 (thing)
        gt[50:, :] = 2  # cat 7 (stuff)
        gt_segments = [
            {"id": 1, "category_id": 1, "iscrowd": 0},
            {"id": 2, "category_id": 7, "iscrowd": 0},
        ]
        return gt, gt_segments

    def test_perfect_prediction(self):
        gt, gt_segments = self.make_maps()
        pred_segments = [
            {"id": 5, "category_id": 1},
            {"id": 6, "category_id": 7},
        ]
        pred = np.where(gt == 1, 5, 6)
        stat = pq_compute_image(gt, pred, gt_segments, pred_segments)
        assert stat[1].tp == 1 and stat[1].iou == pytest.approx(1.0)
        assert stat[7].tp == 1
        cats = {
            1: {"id": 1, "isthing": 1},
            7: {"id": 7, "isthing": 0},
        }
        res, _ = stat.pq_average(cats)
        assert res["pq"] == pytest.approx(1.0)
        assert res["sq"] == pytest.approx(1.0)

    def test_half_overlap_is_match(self):
        gt, gt_segments = self.make_maps()
        # prediction covers rows 0-29 of the cat-1 segment (IoU = 30/50=0.6)
        pred = np.zeros_like(gt)
        pred[:30, :] = 5
        stat = pq_compute_image(gt, pred, gt_segments, [{"id": 5, "category_id": 1}])
        assert stat[1].tp == 1
        assert stat[1].iou == pytest.approx(0.6)
        assert stat[7].fn == 1

    def test_wrong_class_is_fp_fn(self):
        gt, gt_segments = self.make_maps()
        pred = np.where(gt == 1, 5, 0)
        stat = pq_compute_image(gt, pred, gt_segments, [{"id": 5, "category_id": 7}])
        assert stat[1].fn == 1
        assert stat[7].fp == 1

    def test_void_majority_prediction_ignored(self):
        gt = np.zeros((10, 10), np.int64)  # all VOID
        gt[0, 0] = 1
        pred = np.full((10, 10), 3, np.int64)
        stat = pq_compute_image(
            gt,
            pred,
            [{"id": 1, "category_id": 2, "iscrowd": 0}],
            [{"id": 3, "category_id": 5}],
        )
        # pred overlaps VOID on 99% of its area -> ignored, no FP
        assert stat[5].fp == 0

    def test_crowd_ignored(self):
        gt = np.zeros((10, 10), np.int64)
        gt[:, :] = 9
        stat = pq_compute_image(
            gt,
            np.where(gt == 9, 4, 0),
            [{"id": 9, "category_id": 2, "iscrowd": 1}],
            [{"id": 4, "category_id": 2}],
        )
        assert stat[2].tp == 0 and stat[2].fn == 0 and stat[2].fp == 0

    def test_open_set_split(self):
        cats = {
            1: {"id": 1, "isthing": 1},
            2: {"id": 2, "isthing": 1},
            7: {"id": 7, "isthing": 0},
        }
        stat = PQStat()
        stat[1].tp, stat[1].iou = 1, 0.9
        stat[2].tp, stat[2].iou = 1, 0.7
        stat[7].tp, stat[7].iou = 1, 0.8
        known, _ = stat.pq_average(cats, isthing=True, isunknown=False, unknown_cat_ids=[2])
        unknown, _ = stat.pq_average(cats, isthing=True, isunknown=True, unknown_cat_ids=[2])
        stuff, _ = stat.pq_average(cats, isthing=False, unknown_cat_ids=[2])
        assert known["pq"] == pytest.approx(0.9)
        assert unknown["pq"] == pytest.approx(0.7)
        assert stuff["pq"] == pytest.approx(0.8)


@pytest.fixture(scope="module")
def panoptic_fixture(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("pan")
    (root / "pngs").mkdir()
    cats = [
        {"id": 1, "name": "person", "isthing": 1},
        {"id": 2, "name": "dog", "isthing": 1},
        {"id": 7, "name": "grass", "isthing": 0},
    ]
    images, annotations = [], []
    for i in range(2):
        h, w = 96, 128
        img = (np.random.RandomState(i).rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / f"img{i}.jpg"), img)
        images.append({"id": i + 1, "file_name": f"img{i}.jpg", "height": h, "width": w})
        pan = np.zeros((h, w), np.int64)
        pan[:30, :40] = 10  # person instance
        pan[40:70, 50:90] = 11  # dog instance
        pan[80:, :] = 12  # grass stuff
        rgb = id2rgb(pan)
        cv2.imwrite(
            str(root / "pngs" / f"img{i}.png"),
            cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR),
        )
        annotations.append(
            {
                "image_id": i + 1,
                "file_name": f"img{i}.png",
                "segments_info": [
                    {"id": 10, "category_id": 1, "iscrowd": 0, "area": 1200},
                    {"id": 11, "category_id": 2, "iscrowd": 0, "area": 1200},
                    {"id": 12, "category_id": 7, "iscrowd": 0, "area": 2048},
                ],
            }
        )
    ann_file = str(root / "panoptic.json")
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": annotations, "categories": cats}, f)
    unknown_file = str(root / "unknown.txt")
    with open(unknown_file, "w") as f:
        f.write("dog")
    return dict(root=str(root), ann=ann_file, unknown=unknown_file)


class TestPanopticDataset:
    def test_train_gt_merging(self, panoptic_fixture):
        from betrayed_by_captions_tpu.data.coco_panoptic import CocoPanopticDatasetOpen
        from betrayed_by_captions_tpu.data.transforms import TrainTransform

        ds = CocoPanopticDatasetOpen(
            panoptic_fixture["ann"],
            img_prefix=panoptic_fixture["root"],
            seg_prefix=os.path.join(panoptic_fixture["root"], "pngs"),
            unknown_file=panoptic_fixture["unknown"],
            train_transform=TrainTransform(image_size=(128, 128), max_instances=8),
        )
        assert ds.num_known_things == 1  # dog is unknown
        assert ds.num_stuff == 1
        masks, labels = ds.parse_panoptic_gt(1)
        # dog (unknown) dropped: person (label 0) + grass (label 1)
        assert sorted(labels.tolist()) == [0, 1]
        s = ds[0]
        assert s["image"].shape == (128, 128, 3)

    def test_evaluate_pq_oracle(self, panoptic_fixture):
        from betrayed_by_captions_tpu.data.coco_panoptic import (
            INSTANCE_OFFSET,
            CocoPanopticDatasetOpen,
        )

        ds = CocoPanopticDatasetOpen(
            panoptic_fixture["ann"],
            img_prefix=panoptic_fixture["root"],
            seg_prefix=os.path.join(panoptic_fixture["root"], "pngs"),
            unknown_file=panoptic_fixture["unknown"],
            test_mode=True,
        )
        # oracle predictions in the all-bank label order [person, dog, grass]
        label_to_cat = [1, 2, 7]
        preds = []
        for i in range(2):
            gt = ds._load_pan_map(ds.pan_anns[i + 1])
            pred = np.full(gt.shape, 3, np.int64)  # background label = 3
            pred[gt == 10] = 0 + 1 * INSTANCE_OFFSET  # person inst 1
            pred[gt == 11] = 1 + 2 * INSTANCE_OFFSET  # dog inst 2
            pred[gt == 12] = 2  # grass stuff
            preds.append(pred)
        metrics = ds.evaluate_pq(preds, label_to_cat)
        assert metrics["known_things.pq"] == pytest.approx(100.0)
        assert metrics["unknown_things.pq"] == pytest.approx(100.0)
        assert metrics["stuff.pq"] == pytest.approx(100.0)


@pytest.mark.slow
class TestPanopticEvalLoop:
    def test_config_driven_osps_eval(self, panoptic_fixture, tmp_path):
        """engine.test_loop routes panoptic datasets through the host
        panoptic fusion + open-set PQ (batched, bucketed)."""
        import jax
        import jax.numpy as jnp

        from betrayed_by_captions_tpu.config import Config
        from betrayed_by_captions_tpu.engine import test_loop
        from betrayed_by_captions_tpu.models.detector import build_detector

        emb_dim = 16
        rs = np.random.RandomState(0)
        emb_file = tmp_path / "pan_emb.json"
        with open(emb_file, "w") as f:
            json.dump(
                [
                    {"id": 1, "name": "person", "emb": rs.randn(emb_dim).tolist()},
                    {"id": 2, "name": "dog", "emb": rs.randn(emb_dim).tolist()},
                    {"id": 7, "name": "grass", "emb": rs.randn(emb_dim).tolist()},
                ],
                f,
            )
        cfg = Config.fromdict(
            dict(
                assets=dict(class_to_emb_file=str(emb_file)),
                model=dict(
                    num_classes=3,
                    num_queries=6,
                    feat_channels=32,
                    emb_dim=emb_dim,
                    num_decoder_layers=2,
                    use_caption_generation=False,
                ),
                data=dict(
                    val=dict(
                        type="CocoPanopticDatasetOpen",
                        ann_file=panoptic_fixture["ann"],
                        img_prefix=panoptic_fixture["root"],
                        seg_prefix=os.path.join(panoptic_fixture["root"], "pngs"),
                        unknown_file=panoptic_fixture["unknown"],
                        test_scale=(128, 96),
                        test_pad_bucket=(96, 128),
                    ),
                ),
                eval_batch_size=2,
            )
        )
        model = build_detector(Config.fromdict(dict(cfg.model)))
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 96, 128, 3))
        )["params"]
        metrics = test_loop.evaluate(cfg, params, work_dir=str(tmp_path))
        for key in ("known_things.pq", "unknown_things.pq", "stuff.pq", "all.pq"):
            assert key in metrics, metrics.keys()
        assert os.path.exists(tmp_path / "eval.json")


class TestFusionReferenceOracle:
    """The device and host panoptic fusions must match a literal numpy
    transcription of the reference's sequential two-pass paste loop
    (maskformer_fusion_head.py:102-158): iou tested on the UNFILTERED
    winner area, filter_low_score shrinking only pasted thing masks,
    stuff pasted unfiltered into remaining void with the area limit on
    that intersection."""

    @staticmethod
    def _oracle(cls_emb, mask_logits, bank, num_things, object_mask_thr,
                iou_thr, filter_low_score, stuff_area_limit):
        def softmax(x):
            e = np.exp(x - x.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)

        INSTANCE_OFFSET = 1000000
        scores_full = softmax(cls_emb @ bank.T)
        num_classes = scores_full.shape[-1] - 1
        scores, labels = scores_full.max(-1), scores_full.argmax(-1)
        probs = 1.0 / (1.0 + np.exp(-mask_logits))
        keep = (labels != num_classes) & (scores > object_mask_thr)
        h, w = mask_logits.shape[1:]
        pan = np.full((h, w), num_classes, np.int64)
        if not keep.any():
            return pan
        kept = np.flatnonzero(keep)
        weighted = scores[kept, None, None] * probs[kept]
        winner = weighted.argmax(0)
        instance_id = 1
        stuff_list = []
        for ki, qi in enumerate(kept):
            mask = winner == ki
            mask_area = int(mask.sum())
            original_area = int((probs[qi] >= 0.5).sum())
            if filter_low_score:
                mask = mask & (probs[qi] >= 0.5)
            if mask_area > 0 and original_area > 0:
                if mask_area / original_area < iou_thr:
                    continue
                if int(labels[qi]) < num_things:
                    pan[mask] = labels[qi] + instance_id * INSTANCE_OFFSET
                    instance_id += 1
                else:
                    stuff_list.append(ki)
        for ki in stuff_list:
            mask = (winner == ki) & (pan == num_classes)
            if int(mask.sum()) >= stuff_area_limit:
                pan[mask] = labels[kept[ki]]
        return pan

    @pytest.mark.parametrize("filter_low_score", [True, False])
    def test_device_and_host_match_oracle(self, filter_low_score):
        import jax.numpy as jnp

        from betrayed_by_captions_tpu.evaluation.osps import (
            postprocess_panoptic_host,
        )
        from betrayed_by_captions_tpu.models.fusion_head import (
            panoptic_postprocess_emb,
        )

        rng = np.random.RandomState(3)
        q, d, h, w, c, num_things = 10, 8, 40, 48, 5, 3
        for trial in range(5):
            cls_emb = rng.randn(q, d).astype(np.float32) * 2
            bank = np.vstack(
                [rng.randn(c, d).astype(np.float32) * 2, np.zeros((1, d), np.float32)]
            )
            # blobby overlapping logits so winner regions and the 0.5
            # threshold genuinely disagree
            mask_logits = (
                rng.randn(q, h, w).astype(np.float32) * 0.5
            )
            for qi in range(q):
                cy, cx = rng.randint(h), rng.randint(w)
                yy, xx = np.mgrid[:h, :w]
                r2 = (yy - cy) ** 2 + (xx - cx) ** 2
                mask_logits[qi] += 8.0 * np.exp(-r2 / (2 * (4 + 6 * rng.rand()) ** 2)) - 2.0
            kw = dict(
                num_things_classes=num_things,
                object_mask_thr=0.3,
                iou_thr=0.6,
                filter_low_score=filter_low_score,
                stuff_area_limit=30,
            )
            want = self._oracle(
                cls_emb, mask_logits, bank, num_things, 0.3, 0.6,
                filter_low_score, 30,
            )
            got_dev = np.asarray(
                panoptic_postprocess_emb(
                    jnp.asarray(cls_emb), jnp.asarray(mask_logits),
                    jnp.asarray(bank), **kw
                )
            )
            got_host = postprocess_panoptic_host(
                cls_emb, mask_logits, bank,
                img_shape=(h, w), ori_shape=(h, w), pad_shape=(h, w), **kw
            )
            # labels/ids equal up to the instance-id numbering, which both
            # implementations define identically (paste order) — compare raw
            np.testing.assert_array_equal(got_dev, want, err_msg=f"device trial {trial}")
            np.testing.assert_array_equal(got_host, want, err_msg=f"host trial {trial}")
