"""Data-layer tests on a synthetic COCO fixture (SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

from betrayed_by_captions_tpu.data.coco import CocoDatasetOpen
from betrayed_by_captions_tpu.data.loader import ClassBalancedDataset, DataLoader
from betrayed_by_captions_tpu.data.parser import (
    LVISParser,
    lemmatize_sentence,
    lemmatize_word,
)
from betrayed_by_captions_tpu.data.tokenizer import (
    WordPieceTokenizer,
    synthetic_vocab,
)
from betrayed_by_captions_tpu.data.transforms import TestTransform, TrainTransform


@pytest.fixture(scope="module")
def coco_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    import cv2

    images, annotations, captions = [], [], []
    cats = [
        {"id": 1, "name": "person"},
        {"id": 2, "name": "dog"},
        {"id": 3, "name": "cat"},
    ]
    ann_id = 1
    for i in range(4):
        h, w = 120 + 10 * i, 160
        img = (np.random.RandomState(i).rand(h, w, 3) * 255).astype(np.uint8)
        fname = f"img{i}.jpg"
        cv2.imwrite(str(root / fname), img)
        images.append(
            {"id": i + 1, "file_name": fname, "height": h, "width": w}
        )
        for j in range(2):
            x0, y0 = 10 + 30 * j, 20
            poly = [x0, y0, x0 + 25, y0, x0 + 25, y0 + 35, x0, y0 + 35]
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": (j % 3) + 1,
                    "bbox": [x0, y0, 25, 35],
                    "area": 25 * 35,
                    "segmentation": [poly],
                    "iscrowd": 0,
                }
            )
            ann_id += 1
        captions.append(
            {
                "id": 1000 + i,
                "image_id": i + 1,
                "caption": "two dogs and a person sitting on benches",
            }
        )

    inst = {"images": images, "annotations": annotations, "categories": cats}
    caps = {"images": images, "annotations": captions}
    inst_file = str(root / "instances.json")
    caps_file = str(root / "captions.json")
    with open(inst_file, "w") as f:
        json.dump(inst, f)
    with open(caps_file, "w") as f:
        json.dump(caps, f)

    known_file = str(root / "known.txt")
    unknown_file = str(root / "unknown.txt")
    with open(known_file, "w") as f:
        f.write("person\ndog\ncat")
    with open(unknown_file, "w") as f:
        f.write("cat")
    return dict(
        root=str(root),
        inst=inst_file,
        caps=caps_file,
        known=known_file,
        unknown=unknown_file,
    )


class TestTokenizer:
    def test_wordpiece_splits(self):
        tok = WordPieceTokenizer(synthetic_vocab(["play", "##ing"]))
        assert tok.tokenize("playing") == ["play", "##ing"]
        assert tok.tokenize("dogs") == ["dog", "##s"]
        assert tok.tokenize("zzzq") == ["[UNK]"]

    def test_encode_pads_and_truncates(self):
        tok = WordPieceTokenizer(synthetic_vocab())
        ids, mask = tok.encode("a dog on the bench", max_length=10)
        assert len(ids) == len(mask) == 10
        assert ids[0] == tok.cls_id
        assert tok.sep_id in ids
        assert mask[sum(mask):] == [0] * (10 - sum(mask))
        ids2, _ = tok.encode(" ".join(["dog"] * 50), max_length=10)
        assert len(ids2) == 10 and ids2[-1] == tok.sep_id

    def test_decode_roundtrip(self):
        tok = WordPieceTokenizer(synthetic_vocab())
        ids, mask = tok.encode("a dog", max_length=8)
        text = tok.decode([i for i, m in zip(ids, mask) if m], skip_special=True)
        assert text == "a dog"


class TestParser:
    def test_lemmatize(self):
        assert lemmatize_word("dogs") == "dog"
        assert lemmatize_word("benches") == "bench"
        assert lemmatize_word("people") == "person"
        assert lemmatize_word("glasses") == "glass"
        assert lemmatize_word("knives") == "knife"
        assert lemmatize_sentence("Two dogs playing.") == "two dog playing"

    def test_lvis_parser_finds_objects(self):
        parser = LVISParser()
        nouns, ids = parser.parse("Two dogs and a person sitting on benches")
        assert "dog" in nouns
        assert "person" in nouns
        assert "bench" in nouns
        assert len(ids) == len(nouns)

    def test_multiword_synonym(self):
        parser = LVISParser()
        nouns, _ = parser.parse("a fire hydrant on the street")
        assert "fire hydrant" in nouns


class TestTransforms:
    def test_train_transform_shapes(self):
        t = TrainTransform(image_size=(128, 128), max_instances=10)
        rng = np.random.RandomState(0)
        img = (rng.rand(100, 150, 3) * 255).astype(np.float32)
        masks = np.zeros((3, 100, 150), np.uint8)
        masks[:, 30:60, 40:90] = 1
        labels = np.array([0, 1, 2], np.int32)
        out = t(img, masks, labels, rng)
        assert out["image"].shape == (128, 128, 3)
        assert out["gt_masks"].shape == (10, 128, 128)
        assert out["gt_labels"].shape == (10,)
        assert 0 <= out["num_gts"] <= 3
        assert (out["gt_labels"][out["num_gts"]:] == -1).all()

    def test_test_transform_buckets(self):
        t = TestTransform(scale=(1333, 800), pad_bucket=(800, 1344))
        img = np.zeros((480, 640, 3), np.float32)
        padded, meta = t(img)
        assert padded.shape == (800, 1344, 3)
        assert meta["img_shape"][0] <= 800
        # portrait image flips the bucket
        padded2, meta2 = t(np.zeros((640, 480, 3), np.float32))
        assert padded2.shape == (1344, 800, 3)


class TestDataset:
    def test_train_sample_contract(self, coco_fixture):
        ds = CocoDatasetOpen(
            coco_fixture["inst"],
            img_prefix=coco_fixture["root"],
            caption_ann_file=coco_fixture["caps"],
            known_file=coco_fixture["known"],
            unknown_file=coco_fixture["unknown"],
        )
        # 'cat' is novel: excluded from training labels
        assert len(ds.known_cat_ids) == 2
        assert len(ds.unknown_cat_ids) == 1
        s = ds[0]
        assert s["image"].shape == (1024, 1024, 3)
        assert s["gt_masks"].shape[0] == 100
        assert s["caption_ids"].shape == (35,)
        assert s["caption_nouns_mask"].sum() > 0
        valid_labels = s["gt_labels"][: s["num_gts"]]
        assert (valid_labels >= 0).all() and (valid_labels < 2).all()

    def test_loader_batches(self, coco_fixture):
        from betrayed_by_captions_tpu.data.transforms import TrainTransform

        ds = CocoDatasetOpen(
            coco_fixture["inst"],
            img_prefix=coco_fixture["root"],
            caption_ann_file=coco_fixture["caps"],
            known_file=coco_fixture["known"],
            unknown_file=coco_fixture["unknown"],
            train_transform=TrainTransform(image_size=(128, 128), max_instances=8),
        )
        loader = DataLoader(ds, batch_size=2, num_workers=2, seed=1)
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert b["image"].shape == (2, 128, 128, 3)
        assert b["gt_masks"].shape == (2, 8, 128, 128)
        assert b["caption_ids"].shape == (2, 35)

    def test_loader_cache_samples(self):
        """cache_samples memoizes transformed samples across epochs: each
        index is fetched from the dataset exactly once (the soak harness
        relies on this to decouple host augmentation cost from sustained
        chip throughput, tools/soak_train.py)."""

        class CountingDataset:
            def __init__(self, n):
                self.n = n
                self.calls = {i: 0 for i in range(n)}

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                self.calls[int(i)] += 1
                return {"x": np.full((4,), float(i), np.float32)}

        ds = CountingDataset(6)
        loader = DataLoader(
            ds,
            batch_size=2,
            num_workers=2,
            seed=1,
            cache_samples=True,
            process_count=1,
            process_index=0,
        )
        epochs = []
        for epoch in range(3):
            loader.set_epoch(epoch)
            epochs.append(list(loader))
        assert all(v == 1 for v in ds.calls.values()), ds.calls
        # cached epochs restack the SAME per-index arrays (frozen aug),
        # while the epoch permutation still reshuffles
        flat = [
            sorted(float(b["x"][j, 0]) for b in ep for j in range(2))
            for ep in epochs
        ]
        assert flat[0] == flat[1] == flat[2] == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]

    def test_fused_mask_resize_crop_matches_cv2(self):
        """The TrainTransform's fused nearest-resize+crop gather must
        equal cv2.INTER_NEAREST resize followed by the crop, for up-
        and down-scales and crops at both corners."""
        from betrayed_by_captions_tpu.data.transforms import _resize_masks

        rng = np.random.RandomState(7)
        for (h, w, new_h, new_w, y0, x0, th, tw) in [
            (40, 60, 80, 120, 10, 30, 48, 48),   # upscale, inner crop
            (40, 60, 80, 120, 32, 72, 48, 48),   # upscale, far corner
            (64, 64, 17, 17, 0, 0, 48, 48),      # downscale smaller than target
            (33, 47, 33, 47, 0, 0, 33, 47),      # identity
        ]:
            masks = (rng.rand(3, h, w) > 0.5).astype(np.uint8)
            want = _resize_masks(masks, new_w, new_h)[
                :, y0 : y0 + th, x0 : x0 + tw
            ]
            ch, cw = min(th, new_h - y0), min(tw, new_w - x0)
            src_rows = np.minimum(
                (np.arange(y0, y0 + ch) * (h / new_h)).astype(np.intp), h - 1
            )
            src_cols = np.minimum(
                (np.arange(x0, x0 + cw) * (w / new_w)).astype(np.intp), w - 1
            )
            got = masks[:, src_rows[:, None], src_cols[None, :]]
            np.testing.assert_array_equal(got, want, err_msg=str((h, w, new_h)))

    def test_loader_cache_fill_epoch_pinned(self):
        """A cache filled mid-run (e.g. a restarted soak leg resuming at
        epoch 200) must hold the SAME samples as a cache filled at epoch
        0: misses augment at the pinned cache_fill_epoch, not the
        current epoch.  Round-4's resume-loss 'discontinuity' was a
        current-epoch refill against a model overfit to the first leg's
        frozen samples (tools/resume_probe.py, round 5)."""

        class EpochDataset:
            def __init__(self, n):
                self.n = n
                self.epoch = 0

            def __len__(self):
                return self.n

            def set_epoch(self, e):
                self.epoch = e

            def __getitem__(self, i):
                # sample content depends on the epoch, like real
                # per-(seed, epoch, idx) augmentation
                return {
                    "x": np.full((2,), 100.0 * self.epoch + i, np.float32)
                }

        def collect(loader, epoch):
            loader.set_epoch(epoch)
            return sorted(
                float(b["x"][j, 0]) for b in loader for j in range(2)
            )

        kw = dict(batch_size=2, num_workers=2, seed=1, cache_samples=True,
                  process_count=1, process_index=0)
        first_leg = collect(DataLoader(EpochDataset(4), **kw), 0)
        restarted = collect(DataLoader(EpochDataset(4), **kw), 200)
        assert first_leg == restarted == [0.0, 1.0, 2.0, 3.0]

    def test_loader_deterministic_across_worker_counts(self, coco_fixture):
        """Augmentation/caption RNG is per-(seed, epoch, item), so batches
        are identical regardless of thread scheduling or worker count."""
        from betrayed_by_captions_tpu.data.transforms import TrainTransform

        def run(num_workers, epoch):
            ds = CocoDatasetOpen(
                coco_fixture["inst"],
                img_prefix=coco_fixture["root"],
                caption_ann_file=coco_fixture["caps"],
                known_file=coco_fixture["known"],
                unknown_file=coco_fixture["unknown"],
                train_transform=TrainTransform(
                    image_size=(128, 128), max_instances=8
                ),
                seed=3,
            )
            loader = DataLoader(ds, batch_size=2, num_workers=num_workers, seed=1)
            loader.set_epoch(epoch)
            return list(loader)

        a, b = run(1, epoch=0), run(4, epoch=0)
        assert len(a) == len(b)
        for ba, bb in zip(a, b):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)
        # different epoch -> different augmentation draws
        c = run(1, epoch=1)
        assert any(
            not np.array_equal(ba["image"], bc["image"]) for ba, bc in zip(a, c)
        )

    def test_loader_process_workers_match_threads(self, coco_fixture):
        """Forked process workers (the default — the per-sample transform
        work is GIL-bound, round-3 soak data_time 17-22 s vs ~5 s chip
        step) produce bit-identical batches to the thread path: sample
        RNG is stateless per (seed, epoch, idx)."""
        from betrayed_by_captions_tpu.data.transforms import TrainTransform

        def run(worker_type):
            ds = CocoDatasetOpen(
                coco_fixture["inst"],
                img_prefix=coco_fixture["root"],
                caption_ann_file=coco_fixture["caps"],
                known_file=coco_fixture["known"],
                unknown_file=coco_fixture["unknown"],
                train_transform=TrainTransform(
                    image_size=(128, 128), max_instances=8
                ),
                seed=3,
            )
            loader = DataLoader(
                ds, batch_size=2, num_workers=2, seed=1,
                worker_type=worker_type,
            )
            loader.set_epoch(2)
            return list(loader)

        a, b = run("process"), run("thread")
        assert len(a) == len(b) and len(a) > 0
        for ba, bb in zip(a, b):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)

    def test_loader_cache_refuses_large_datasets(self):
        class Big:
            def __len__(self):
                return 5000

            def __getitem__(self, i):
                return {"x": np.zeros(1, np.float32)}

        with pytest.raises(ValueError, match="cache_samples"):
            DataLoader(
                Big(), batch_size=2, num_workers=1, cache_samples=True,
                process_count=1, process_index=0,
            )

    def test_class_balanced_wrapper(self, coco_fixture):
        ds = CocoDatasetOpen(
            coco_fixture["inst"],
            img_prefix=coco_fixture["root"],
            caption_ann_file=coco_fixture["caps"],
            known_file=coco_fixture["known"],
            unknown_file=coco_fixture["unknown"],
        )
        wrapped = ClassBalancedDataset(ds, oversample_thr=0.9)
        assert len(wrapped) >= len(ds)

    def test_test_mode(self, coco_fixture):
        ds = CocoDatasetOpen(
            coco_fixture["inst"],
            img_prefix=coco_fixture["root"],
            test_mode=True,
        )
        img, meta = ds[0]
        assert img.ndim == 3
        assert "ori_shape" in meta and "scale_factor" in meta


class TestMultiProcessSharding:
    class _Toy:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"x": np.asarray(i, np.int64)}

    def test_disjoint_process_shards_cover_dataset(self):
        """Two-process loaders see the same epoch permutation but disjoint
        strided shards (multi-host data parallelism)."""
        ds = self._Toy(13)
        loaders = [
            DataLoader(
                ds, batch_size=2, num_workers=1, seed=5,
                process_count=2, process_index=p,
            )
            for p in (0, 1)
        ]
        seen = []
        for ld in loaders:
            ld.set_epoch(1)
            vals = [int(v) for b in ld for v in b["x"]]
            assert len(vals) == len(ld) * 2
            seen.append(set(vals))
        assert seen[0].isdisjoint(seen[1])
        # together they cover 12 of 13 items (trim to process multiple,
        # then drop_last per process)
        assert len(seen[0] | seen[1]) == 12

    def test_collect_results_single_process(self, tmp_path):
        from betrayed_by_captions_tpu.parallel.multihost import (
            collect_results_cpu,
        )

        local = {i: f"r{i}" for i in range(4)}
        out = collect_results_cpu(str(tmp_path), local, 4)
        assert out == ["r0", "r1", "r2", "r3"]


class TestImageNet21KParser:
    def test_matches_class_names(self, tmp_path):
        from betrayed_by_captions_tpu.data.parser import ImageNet21KParser

        names = tmp_path / "in21k.txt"
        names.write_text("golden_retriever fire_hydrant dog bench\n")
        p = ImageNet21KParser(str(names))
        nouns, ids = p.parse("A golden retriever sitting near a fire hydrant")
        assert "golden retriever" in nouns
        assert "fire hydrant" in nouns
        assert ids[nouns.index("golden retriever")] == 0
        assert ids[nouns.index("fire hydrant")] == 1

    def test_missing_file_raises(self):
        from betrayed_by_captions_tpu.data.parser import ImageNet21KParser

        with pytest.raises(FileNotFoundError):
            ImageNet21KParser("/nonexistent/in21k.txt")
