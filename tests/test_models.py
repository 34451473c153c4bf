"""Shape/jit tests for the model stack (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betrayed_by_captions_tpu.models import (
    CaptionTransformer,
    Mask2FormerOpen,
    ResNet,
)
from betrayed_by_captions_tpu.models.fusion_head import (
    instance_postprocess_emb,
    panoptic_postprocess_emb,
)


class TestResNet:
    def test_output_shapes(self):
        model = ResNet(depth=50)
        x = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(params, x)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 256),
            (1, 8, 8, 512),
            (1, 4, 4, 1024),
            (1, 2, 2, 2048),
        ]

    def test_s2d_stem_exact(self, rng):
        """The space-to-depth stem must reproduce the direct 7x7/2 conv
        exactly (same params, same outputs) — it is a weight
        rearrangement, not an approximation."""
        from betrayed_by_captions_tpu.models.resnet import StemConv

        x = jnp.asarray(rng.randn(2, 32, 40, 3).astype(np.float32))
        direct = StemConv(space_to_depth=False)
        packed = StemConv(space_to_depth=True)
        params = direct.init(jax.random.PRNGKey(0), x)
        a = direct.apply(params, x)
        b = packed.apply(params, x)  # same param tree
        assert a.shape == b.shape == (2, 16, 20, 64)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


class TestDetector:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = Mask2FormerOpen(
            num_classes=5,
            num_queries=8,
            feat_channels=32,
            emb_dim=16,
            num_decoder_layers=3,
            use_caption_generation=False,
        )
        x = jnp.zeros((2, 64, 96, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        return model, params, x

    def test_forward_shapes(self, model_and_params):
        model, params, x = model_and_params
        out = jax.jit(lambda p, im: model.apply(p, im))(params, x)
        # 3 decoder layers + initial head = 4 outputs
        assert out["cls_scores"].shape == (4, 2, 8, 6)
        assert out["cls_emb_preds"].shape == (4, 2, 8, 16)
        assert out["mask_preds"].shape == (4, 2, 8, 16, 24)  # stride 4

    def test_outputs_finite(self, model_and_params):
        model, params, x = model_and_params
        key = jax.random.PRNGKey(1)
        img = jax.random.normal(key, x.shape)
        out = model.apply(params, img)
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()


class TestCaptionTransformer:
    def test_forward_and_layer_logits(self):
        model = CaptionTransformer(
            num_layers=2, hidden_dim=16, input_dim=16, ff_dim=8,
            num_heads=2, seq_length=10, vocab_size=50,
        )
        tgt = jnp.zeros((2, 7, 16))
        mem = jnp.zeros((2, 4, 16))
        params = model.init(jax.random.PRNGKey(0), tgt, mem)
        hidden, logits = model.apply(params, tgt, mem)
        assert hidden.shape == (2, 2, 7, 16)
        assert logits.shape == (2, 7, 50)
        all_logits = model.apply(params, hidden, method="generate")
        assert all_logits.shape == (2, 2, 7, 50)

    def test_causal(self):
        """Output at position t must not depend on tokens after t."""
        model = CaptionTransformer(
            num_layers=1, hidden_dim=8, input_dim=8, ff_dim=8,
            num_heads=2, seq_length=6, vocab_size=11,
        )
        rng = jax.random.PRNGKey(0)
        tgt = jax.random.normal(rng, (1, 5, 8))
        mem = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8))
        params = model.init(rng, tgt, mem)
        _, logits_a = model.apply(params, tgt, mem)
        tgt_b = tgt.at[:, 3:, :].set(99.0)  # perturb the future
        _, logits_b = model.apply(params, tgt_b, mem)
        np.testing.assert_allclose(
            np.asarray(logits_a[:, :3]), np.asarray(logits_b[:, :3]), atol=1e-5
        )


class TestOnlyLastEval:
    def test_matches_full_forward(self, rng):
        """only_last (eval fast path: level-resolution attn-mask einsums,
        final layer only) must reproduce the full forward's last-layer
        outputs — resize and the channel einsum commute exactly."""
        from betrayed_by_captions_tpu.models.detector import Mask2FormerOpen

        model = Mask2FormerOpen(
            num_classes=3, num_queries=6, feat_channels=32, emb_dim=16,
            num_decoder_layers=3, use_caption_generation=False,
        )
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        params = model.init(
            jax.random.PRNGKey(0), x, method="init_forward"
        )["params"]
        full = model.apply({"params": params}, x)
        fast = model.apply({"params": params}, x, only_last=True)
        assert fast["mask_preds"].shape[0] == 1
        for k in ("cls_scores", "cls_emb_preds", "mask_preds"):
            np.testing.assert_allclose(
                np.asarray(full[k][-1], np.float32),
                np.asarray(fast[k][-1], np.float32),
                rtol=1e-5,
                atol=1e-5,
            )


class TestFusionHead:
    def test_instance_postprocess(self, rng):
        q, d, h, w = 6, 8, 16, 16
        emb = jnp.asarray(rng.randn(q, d).astype(np.float32))
        masks = jnp.asarray(rng.randn(q, h, w).astype(np.float32) * 4)
        bank = jnp.asarray(
            np.vstack([rng.randn(3, d), np.zeros((1, d))]).astype(np.float32)
        )
        res = instance_postprocess_emb(emb, masks, bank, max_per_image=10)
        assert res.labels.shape == (10,)
        assert res.scores.shape == (10,)
        assert res.boxes.shape == (10, 4)
        assert res.masks.shape == (10, h, w)
        assert (np.asarray(res.labels) < 3).all()
        s = np.asarray(res.scores)
        assert (s >= 0).all() and (s <= 1).all()

    def test_upsampled_query_stats_exact(self, rng):
        """The fused upsample+stats path must equal resize-then-stats
        exactly in f32 (it is the same phase arithmetic, reordered)."""
        from betrayed_by_captions_tpu.models.fusion_head import (
            query_mask_stats,
            upsampled_query_stats,
        )
        from betrayed_by_captions_tpu.ops.resize import bilinear_resize

        b, q, h, w = 2, 5, 8, 12
        masks = jnp.asarray(rng.randn(b, q, h, w).astype(np.float32) * 4)
        for out_hw in [(h * 4, w * 4), (h * 2, w * 2), (h, w)]:
            bin_f, score_f, box_f = upsampled_query_stats(
                masks, out_hw, mask_dtype=jnp.float32
            )
            up = bilinear_resize(masks, *out_hw)
            import jax

            bin_r, score_r, box_r = jax.vmap(query_mask_stats)(up)
            np.testing.assert_array_equal(np.asarray(bin_f), np.asarray(bin_r))
            np.testing.assert_allclose(
                np.asarray(score_f), np.asarray(score_r), rtol=1e-6, atol=1e-6
            )
            np.testing.assert_array_equal(np.asarray(box_f), np.asarray(box_r))

    def test_shared_postprocess_matches_per_image(self, rng):
        """instance_postprocess_shared (stats once, per-bank select) must
        reproduce instance_postprocess_emb on the upsampled masks."""
        from betrayed_by_captions_tpu.models.fusion_head import (
            instance_postprocess_shared,
        )
        from betrayed_by_captions_tpu.ops.resize import bilinear_resize

        b, q, d, h, w = 2, 6, 8, 8, 12
        emb = jnp.asarray(rng.randn(b, q, d).astype(np.float32))
        masks = jnp.asarray(rng.randn(b, q, h, w).astype(np.float32) * 4)
        banks = {
            "all": jnp.asarray(
                np.vstack([rng.randn(4, d), np.zeros((1, d))]).astype(
                    np.float32
                )
            ),
            "novel": jnp.asarray(
                np.vstack([rng.randn(2, d), np.zeros((1, d))]).astype(
                    np.float32
                )
            ),
        }
        out_hw = (h * 4, w * 4)
        sel, masks_bin = instance_postprocess_shared(
            emb, masks, banks, out_hw=out_hw, max_per_image=10,
            mask_dtype=jnp.float32,
        )
        up = bilinear_resize(masks, *out_hw)
        for key, bank in banks.items():
            for bi in range(b):
                ref = instance_postprocess_emb(
                    emb[bi], up[bi], bank, max_per_image=10
                )
                np.testing.assert_array_equal(
                    np.asarray(sel[key].labels[bi]), np.asarray(ref.labels)
                )
                np.testing.assert_allclose(
                    np.asarray(sel[key].scores[bi]),
                    np.asarray(ref.scores),
                    rtol=1e-5,
                    atol=1e-6,
                )
                np.testing.assert_allclose(
                    np.asarray(sel[key].boxes[bi]),
                    np.asarray(ref.boxes),
                    atol=1e-5,
                )
                got_masks = np.asarray(
                    masks_bin[bi][np.asarray(sel[key].query_idx[bi])]
                )
                got_masks = got_masks & np.asarray(
                    sel[key].valid[bi]
                )[:, None, None]
                np.testing.assert_array_equal(got_masks, np.asarray(ref.masks))

    def test_panoptic_postprocess(self, rng):
        q, d, h, w = 5, 8, 24, 24
        emb = rng.randn(q, d).astype(np.float32) * 3
        bank = np.vstack([rng.randn(4, d) * 3, np.zeros((1, d))]).astype(np.float32)
        # construct confident disjoint masks
        masks = np.full((q, h, w), -10.0, np.float32)
        masks[0, :12, :] = 10.0
        masks[1, 12:, :] = 10.0
        pan = panoptic_postprocess_emb(
            jnp.asarray(emb),
            jnp.asarray(masks),
            jnp.asarray(bank),
            num_things_classes=2,
            object_mask_thr=0.0,
            stuff_area_limit=10,
        )
        pan = np.asarray(pan)
        assert pan.shape == (h, w)
        assert set(np.unique(pan)) <= set(range(0, 4)) | {4} | set(
            (np.arange(1, q + 1)[:, None] * 1000000 + np.arange(4)[None]).ravel()
        )


@pytest.mark.slow  # full criterion graph compile, ~80 s on CPU
class TestLearnableTemperature:
    def test_param_exists_and_flows_into_losses(self):
        """learnable_temperature exposes a trainable scalar that scales the
        cls_emb/grounding logits (reference mask2former_head.py:228-229)."""
        import jax

        from betrayed_by_captions_tpu.losses.criterion import (
            CriterionConfig,
            compute_losses,
        )
        from betrayed_by_captions_tpu.models.detector import Mask2FormerOpen

        model = Mask2FormerOpen(
            num_classes=3,
            num_queries=4,
            feat_channels=32,
            emb_dim=8,
            num_decoder_layers=2,
            use_caption_generation=False,
            learnable_temperature=True,
            softmax_temperature_init=7.0,
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
            method="init_forward",
        )["params"]
        assert "softmax_temperature" in params["head"]
        np.testing.assert_allclose(
            np.asarray(params["head"]["softmax_temperature"]), 7.0
        )

        batch = {
            "gt_labels": jnp.zeros((1, 2), jnp.int32),
            "gt_masks": jnp.ones((1, 2, 32, 32), jnp.float32),
            "num_gts": jnp.ones((1,), jnp.int32),
        }
        bank = jnp.ones((4, 8), jnp.float32)
        cfg = CriterionConfig(
            num_classes=3, num_points=8, use_caption=False,
            use_caption_generation=False,
        )

        def loss_of(params):
            out = model.apply({"params": params}, jnp.zeros((1, 32, 32, 3)))
            total, _ = compute_losses(
                jax.random.PRNGKey(1), out, batch, bank, cfg
            )
            return total

        g = jax.grad(loss_of)(params)
        gt = np.asarray(g["head"]["softmax_temperature"])
        assert np.isfinite(gt).all()
        assert np.abs(gt).sum() > 0, "no gradient reaches the temperature"
