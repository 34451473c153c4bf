"""Engine tests: config system, checkpointing, and an end-to-end
config-driven training smoke run on a synthetic dataset."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betrayed_by_captions_tpu.config import Config, parse_cli_options


class TestConfig:
    def test_base_inheritance_and_overrides(self, tmp_path):
        base = tmp_path / "base.py"
        base.write_text("a = 1\nmodel = dict(depth=50, heads=8)\n")
        child = tmp_path / "child.py"
        child.write_text(
            "_base_ = ['base.py']\nmodel = dict(depth=101)\nb = 'x'\n"
        )
        cfg = Config.fromfile(str(child))
        assert cfg.a == 1
        assert cfg.model.depth == 101
        assert cfg.model.heads == 8
        assert cfg.b == "x"

    def test_delete_key(self, tmp_path):
        base = tmp_path / "base.py"
        base.write_text("model = dict(depth=50, heads=8)\n")
        child = tmp_path / "child.py"
        child.write_text(
            "_base_ = ['base.py']\nmodel = dict(_delete_=True, depth=18)\n"
        )
        cfg = Config.fromfile(str(child))
        assert "heads" not in cfg.model

    def test_cli_options(self):
        cfg = Config.fromdict({"model": {"depth": 50}})
        cfg.merge_from_options(parse_cli_options(["model.depth=101", "new.k=[1,2]"]))
        assert cfg.model.depth == 101
        assert cfg.new.k == [1, 2]

    def test_shipped_configs_load(self):
        root = os.path.join(os.path.dirname(__file__), "..", "configs")
        for rel in [
            "instance/coco_b48n17.py",
            "instance/coco_ag_pretrain_3x.py",
            "openset_panoptic/coco_panoptic_p20.py",
            "openset_panoptic/coco_panoptic_p5.py",
            "openset_panoptic/coco_panoptic_p10.py",
            "openset_panoptic/coco_panoptic_p20_ag_pretrain.py",
            "openset_panoptic/coco_panoptic_p5_ag_pretrain.py",
            "openset_panoptic/coco_panoptic_p10_ag_pretrain.py",
            "demo/ade20k_instance.py",
            "demo/coco_instance_ag3x_1x.py",
            "demo/coco_panoptic_p20.py",
        ]:
            cfg = Config.fromfile(os.path.join(root, rel))
            assert "model" in cfg and "data" in cfg, rel


class TestCheckpoint:
    def test_params_save_load_roundtrip(self, tmp_path):
        from betrayed_by_captions_tpu.engine.checkpoint import (
            load_params,
            save_params,
        )

        params = {
            "a": {"kernel": np.ones((3, 4), np.float32)},
            "b": np.arange(5).astype(np.float32),
        }
        path = str(tmp_path / "p.npz")
        save_params(path, params)
        template = jax.tree_util.tree_map(jnp.zeros_like, params)
        restored = load_params(path, template)
        np.testing.assert_array_equal(np.asarray(restored["a"]["kernel"]), 1)
        np.testing.assert_array_equal(np.asarray(restored["b"]), np.arange(5))

    def test_train_state_roundtrip(self, tmp_path):
        import optax

        from betrayed_by_captions_tpu.engine.checkpoint import (
            latest_step,
            restore_checkpoint,
            save_checkpoint,
        )
        from betrayed_by_captions_tpu.engine.train_state import (
            create_train_state,
        )

        params = {"w": jnp.ones((4,))}
        tx = optax.adam(1e-3)
        state = create_train_state(params, tx)
        state = state.apply_gradients({"w": jnp.ones((4,))})
        ckpt_dir = str(tmp_path / "ckpts")
        save_checkpoint(ckpt_dir, state, step=1)
        assert latest_step(ckpt_dir) == 1

        fresh = create_train_state({"w": jnp.zeros((4,))}, tx)
        restored, step = restore_checkpoint(ckpt_dir, fresh)
        assert step == 1
        np.testing.assert_allclose(
            np.asarray(restored.params["w"]), np.asarray(state.params["w"])
        )

    def test_checksum_verifies_and_detects_corruption(self, tmp_path):
        import json

        import optax

        from betrayed_by_captions_tpu.engine.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )
        from betrayed_by_captions_tpu.engine.train_state import (
            create_train_state,
        )

        tx = optax.adam(1e-3)
        state = create_train_state({"w": jnp.arange(4.0)}, tx)
        ckpt_dir = str(tmp_path / "ck")
        save_checkpoint(ckpt_dir, state, step=1, checksum=True)
        sums_path = tmp_path / "ck" / "checksums_1.json"
        assert sums_path.exists()

        fresh = create_train_state({"w": jnp.zeros(4)}, tx)
        restored, step = restore_checkpoint(ckpt_dir, fresh)
        assert step == 1
        np.testing.assert_array_equal(
            np.asarray(restored.params["w"]), np.arange(4.0)
        )

        # corrupt the recorded hash -> restore must refuse
        sums = json.loads(sums_path.read_text())
        key = next(iter(sums))
        sums[key][2] = "0" * 64
        sums_path.write_text(json.dumps(sums))
        with pytest.raises(RuntimeError, match="infidelity"):
            restore_checkpoint(ckpt_dir, fresh)

    def test_checksum_rotation(self, tmp_path):
        import optax

        from betrayed_by_captions_tpu.engine.checkpoint import save_checkpoint
        from betrayed_by_captions_tpu.engine.train_state import (
            create_train_state,
        )

        state = create_train_state({"w": jnp.ones(2)}, optax.sgd(0.1))
        ckpt_dir = tmp_path / "ck"
        for step in (1, 2, 3):
            save_checkpoint(
                str(ckpt_dir), state, step=step, max_keep=2, checksum=True
            )
        names = sorted(
            p.name for p in ckpt_dir.iterdir() if p.name.startswith("checksums")
        )
        assert names == ["checksums_2.json", "checksums_3.json"]

    def test_rotation(self, tmp_path):
        import optax

        from betrayed_by_captions_tpu.engine.checkpoint import (
            latest_step,
            save_checkpoint,
        )
        from betrayed_by_captions_tpu.engine.train_state import (
            create_train_state,
        )

        state = create_train_state({"w": jnp.ones(2)}, optax.sgd(0.1))
        ckpt_dir = str(tmp_path / "ck")
        for step in (1, 2, 3):
            save_checkpoint(ckpt_dir, state, step=step, max_keep=2)
        assert latest_step(ckpt_dir) == 3
        kept = sorted(os.listdir(ckpt_dir))
        assert "1" not in kept  # rotated out


@pytest.mark.slow
class TestTrainLoopSmoke:
    @pytest.mark.slow
    def test_one_epoch_synthetic(self, tmp_path):
        """Full config-driven training on a synthetic dataset."""
        import cv2

        from betrayed_by_captions_tpu.evaluation import rle as rle_codec

        root = tmp_path / "data"
        root.mkdir()
        images, annotations, captions = [], [], []
        cats = [{"id": 1, "name": "person"}, {"id": 2, "name": "dog"}]
        ann_id = 1
        for i in range(8):
            h, w = 64, 64
            img = (np.random.RandomState(i).rand(h, w, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(root / f"img{i}.jpg"), img)
            images.append(
                {"id": i + 1, "file_name": f"img{i}.jpg", "height": h, "width": w}
            )
            m = np.zeros((h, w), np.uint8)
            m[16:48, 16:48] = 1
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": (i % 2) + 1,
                    "segmentation": rle_codec.encode(m),
                    "bbox": [16, 16, 32, 32],
                    "area": 1024,
                    "iscrowd": 0,
                }
            )
            ann_id += 1
            captions.append(
                {"id": 500 + i, "image_id": i + 1, "caption": "a dog and a person"}
            )
        with open(root / "inst.json", "w") as f:
            json.dump(
                {"images": images, "annotations": annotations, "categories": cats},
                f,
            )
        with open(root / "caps.json", "w") as f:
            json.dump({"images": images, "annotations": captions}, f)
        emb_dim = 16
        rs = np.random.RandomState(0)
        with open(root / "class_emb.json", "w") as f:
            json.dump(
                [
                    {"id": c["id"], "name": c["name"], "emb": rs.randn(emb_dim).tolist()}
                    for c in cats
                ],
                f,
            )

        cfg = Config.fromdict(
            dict(
                assets=dict(class_to_emb_file=str(root / "class_emb.json")),
                model=dict(
                    num_queries=6,
                    feat_channels=32,
                    emb_dim=emb_dim,
                    num_decoder_layers=2,
                    caption_num_layers=2,
                    use_caption_generation=True,
                    vocab_size=200,
                    max_caption_len=35,
                ),
                criterion=dict(num_points=16),
                optimizer=dict(lr=1e-4),
                data=dict(
                    samples_per_device=1,
                    workers=2,
                    train=dict(
                        type="CocoDatasetOpen",
                        ann_file=str(root / "inst.json"),
                        caption_ann_file=str(root / "caps.json"),
                        img_prefix=str(root),
                        image_size=(64, 64),
                        max_instances=4,
                    ),
                ),
                max_epochs=1,
                log_interval=1,
                eval_interval=100,
                bert_assets="__missing__",  # synthetic table fallback
            )
        )
        # synthetic bert table needs the tiny vocab size: monkeypatch loader
        import betrayed_by_captions_tpu.engine.train_loop as tl
        from betrayed_by_captions_tpu.models import bert as bert_mod

        orig = bert_mod.load_bert_assets
        bert_mod.load_bert_assets = (
            lambda path=None, allow_synthetic=False: bert_mod.synthetic_bert_assets(
                200, emb_dim
            )
        )
        tl.load_bert_assets = bert_mod.load_bert_assets
        try:
            state = tl.train(cfg, str(tmp_path / "work"), resume=False)
        finally:
            bert_mod.load_bert_assets = orig
            tl.load_bert_assets = orig
        assert int(state.step) == 1  # 8 imgs / batch 8 = 1 step
        assert os.path.isdir(tmp_path / "work" / "checkpoints")
        assert (tmp_path / "work" / "metrics.jsonl").exists()


@pytest.mark.slow
class TestEvalLoopBatched:
    def test_bucketed_batched_eval(self, tmp_path):
        """engine.test_loop.evaluate batches images into the two aspect
        buckets, pads the tail batch, and returns per-image results in
        dataset order (VERDICT round-1 item 7)."""
        import cv2

        from betrayed_by_captions_tpu.engine import test_loop
        from betrayed_by_captions_tpu.evaluation import rle as rle_codec
        from betrayed_by_captions_tpu.models.detector import build_detector

        root = tmp_path / "data"
        root.mkdir()
        images, annotations = [], []
        cats = [{"id": 1, "name": "person"}, {"id": 2, "name": "dog"}]
        rs = np.random.RandomState(0)
        # 5 images: 3 landscape (48x64), 2 portrait (64x48) -> two buckets,
        # odd counts exercise tail padding at eval_batch_size=2
        shapes = [(48, 64), (64, 48), (48, 64), (64, 48), (48, 64)]
        for i, (h, w) in enumerate(shapes):
            img = (rs.rand(h, w, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(root / f"img{i}.jpg"), img)
            images.append(
                {"id": i + 1, "file_name": f"img{i}.jpg", "height": h, "width": w}
            )
            m = np.zeros((h, w), np.uint8)
            m[8 : h // 2, 8 : w // 2] = 1
            annotations.append(
                {
                    "id": i + 1,
                    "image_id": i + 1,
                    "category_id": (i % 2) + 1,
                    "segmentation": rle_codec.encode(m),
                    "bbox": [8, 8, w // 2 - 8, h // 2 - 8],
                    "area": int(m.sum()),
                    "iscrowd": 0,
                }
            )
        with open(root / "inst.json", "w") as f:
            json.dump(
                {"images": images, "annotations": annotations, "categories": cats},
                f,
            )
        emb_dim = 16
        with open(root / "class_emb.json", "w") as f:
            json.dump(
                [
                    {"id": c["id"], "name": c["name"], "emb": rs.randn(emb_dim).tolist()}
                    for c in cats
                ],
                f,
            )

        cfg = Config.fromdict(
            dict(
                assets=dict(class_to_emb_file=str(root / "class_emb.json")),
                model=dict(
                    num_queries=6,
                    feat_channels=32,
                    emb_dim=emb_dim,
                    num_decoder_layers=2,
                    use_caption_generation=False,
                ),
                data=dict(
                    val=dict(
                        type="CocoDatasetOpen",
                        ann_file=str(root / "inst.json"),
                        img_prefix=str(root),
                        test_scale=(64, 48),
                        test_pad_bucket=(48, 64),
                    ),
                ),
                eval_types=("all_results",),
                eval_batch_size=2,
                metrics=("segm",),
            )
        )
        model = build_detector(Config.fromdict(dict(cfg.model, num_classes=2)))
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 48, 64, 3))
        )["params"]
        metrics = test_loop.evaluate(cfg, params)
        assert any(k.startswith("all_results") or "mAP" in k or "segm" in k
                   for k in metrics), metrics
