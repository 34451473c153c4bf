"""End-to-end train-step tests: losses finite, params update, multi-device
data sharding works on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import pytest

pytestmark = pytest.mark.slow  # XLA-compile heavy (minutes on CPU mesh)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betrayed_by_captions_tpu.engine.optim import OptimizerConfig, build_optimizer
from betrayed_by_captions_tpu.engine.train_state import create_train_state
from betrayed_by_captions_tpu.engine.train_step import make_train_step
from betrayed_by_captions_tpu.losses.criterion import CriterionConfig
from betrayed_by_captions_tpu.models.bert import (
    BertWordEmbeddings,
    synthetic_bert_assets,
)
from betrayed_by_captions_tpu.models.detector import Mask2FormerOpen
from betrayed_by_captions_tpu.parallel.mesh import create_mesh, shard_batch

NUM_CLASSES = 5
EMB_DIM = 16
VOCAB = 64
MAX_INST = 6
T_CAP = 9


def tiny_model():
    return Mask2FormerOpen(
        num_classes=NUM_CLASSES,
        num_queries=8,
        feat_channels=32,
        emb_dim=EMB_DIM,
        num_decoder_layers=2,
        caption_num_layers=2,
        use_caption_generation=True,
        vocab_size=VOCAB,
        max_caption_len=T_CAP,
    )


def tiny_criterion():
    return CriterionConfig(
        num_classes=NUM_CLASSES,
        num_points=16,
        softmax_temperature=10.0,
    )


def make_batch(rng, batch_size, h=48, w=48):
    masks = np.zeros((batch_size, MAX_INST, h, w), np.float32)
    labels = np.full((batch_size, MAX_INST), -1, np.int32)
    num_gts = np.zeros((batch_size,), np.int32)
    for b in range(batch_size):
        n = rng.randint(0, MAX_INST)
        num_gts[b] = n
        for g in range(n):
            y0, x0 = rng.randint(0, h - 8), rng.randint(0, w - 8)
            masks[b, g, y0 : y0 + 8, x0 : x0 + 8] = 1.0
            labels[b, g] = rng.randint(0, NUM_CLASSES)
    cap_ids = rng.randint(1, VOCAB, size=(batch_size, T_CAP)).astype(np.int32)
    cap_mask = np.ones((batch_size, T_CAP), np.int32)
    cap_mask[:, 6:] = 0
    cap_ids[cap_mask == 0] = 0
    nouns_ids = rng.randint(1, VOCAB, size=(batch_size, 4)).astype(np.int32)
    nouns_mask = np.ones((batch_size, 4), np.int32)
    nouns_mask[0, :] = 0  # one caption with zero nouns (empty-caption path)
    nouns_ids[nouns_mask == 0] = 0
    return {
        "image": rng.randn(batch_size, h, w, 3).astype(np.float32),
        "gt_labels": labels,
        "gt_masks": masks,
        "num_gts": num_gts,
        "caption_ids": cap_ids,
        "caption_mask": cap_mask,
        "caption_nouns_ids": nouns_ids,
        "caption_nouns_mask": nouns_mask,
    }


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    rng = np.random.RandomState(0)
    batch = make_batch(rng, 8)
    init_vars = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["image"][:1]),
        method="init_forward",
    )
    params = init_vars["params"]
    bank = np.vstack(
        [rng.randn(NUM_CLASSES, EMB_DIM), np.zeros((1, EMB_DIM))]
    ).astype(np.float32)
    bert = BertWordEmbeddings(synthetic_bert_assets(VOCAB, EMB_DIM))
    # one shared compiled step: both tests use identical shapes
    step = make_train_step(model, tiny_criterion(), bank, bert, donate=False)
    return model, params, batch, bank, bert, step


class TestTrainStep:
    def test_one_step_losses_finite_and_updates(self, setup):
        model, params, batch, bank, bert, step = setup
        tx, _ = build_optimizer(params, OptimizerConfig())
        state = create_train_state(params, tx)
        mesh = create_mesh()
        sharded = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
        new_state, metrics = step(state, sharded, jax.random.PRNGKey(1))

        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite: {v}"
        # expected loss keys for 3+1 decoder outputs
        for key in (
            "loss_cls",
            "loss_cls_emb",
            "loss_grounding",
            "loss_caption_generation",
            "loss_mask",
            "loss_dice",
        ):
            assert key in metrics
            assert f"d0.{key}" in metrics

        # trainable params changed, frozen ones did not
        old_flat = jax.tree_util.tree_leaves_with_path(state.params)
        new_flat = dict(
            jax.tree_util.tree_leaves_with_path(new_state.params)
        )
        changed = 0
        for path, old in old_flat:
            new = new_flat[path]
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            if "backbone" in name and ("stem" in name or "layer1" in name):
                np.testing.assert_array_equal(
                    np.asarray(old), np.asarray(new), err_msg=f"frozen {name} moved"
                )
            elif not np.array_equal(np.asarray(old), np.asarray(new)):
                changed += 1
        assert changed > 10
        assert int(new_state.step) == 1

    def test_data_parallel_equals_single_device(self, setup):
        """8-device shard_map step == 1-device step on the same global batch.

        The criterion's normalizers are psum'd and the grounding loss
        all_gathers (reference dist.all_gather semantics,
        mask2former_head.py:650-684), so every loss value and the gradient
        update must be data-parallel invariant (caption dropout off: its
        masks are drawn per local batch, the only non-invariant RNG)."""
        model, params, batch, bank, bert, _ = setup
        cfg = tiny_criterion()
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        rng_step = jax.random.PRNGKey(7)

        step_1 = make_train_step(
            model, cfg, bank, bert, donate=False, caption_dropout=False
        )
        tx, _ = build_optimizer(params, OptimizerConfig())
        state_1, metrics_1 = step_1(
            create_train_state(params, tx), jbatch, rng_step
        )

        mesh = create_mesh(jax.devices()[:8])
        step_8 = make_train_step(
            model, cfg, bank, bert, donate=False, caption_dropout=False,
            mesh=mesh,
        )
        tx8, _ = build_optimizer(params, OptimizerConfig())
        state_8, metrics_8 = step_8(
            create_train_state(params, tx8), shard_batch(jbatch, mesh), rng_step
        )

        assert set(metrics_1) == set(metrics_8)
        for k in metrics_1:
            np.testing.assert_allclose(
                np.asarray(metrics_1[k]),
                np.asarray(metrics_8[k]),
                rtol=1e-5,
                atol=1e-6,
                err_msg=f"metric {k} diverges between 1- and 8-device runs",
            )

        # tolerances: Adam's grad/sqrt(var) normalization amplifies fp
        # reassociation on near-zero gradients into O(lr)-scale update
        # diffs; real DP bugs (missing/double psum) shift params by the
        # update magnitude itself, far beyond these bounds
        p1 = jax.tree_util.tree_leaves_with_path(state_1.params)
        p8 = dict(jax.tree_util.tree_leaves_with_path(state_8.params))
        for path, v1 in p1:
            np.testing.assert_allclose(
                np.asarray(v1),
                np.asarray(p8[path]),
                rtol=1e-3,
                atol=2e-4,
                err_msg=f"param {jax.tree_util.keystr(path)} diverges",
            )

    def test_empty_gt_batch(self, setup):
        """Images with zero GT instances must not produce NaNs
        (reference empty-GT path, mask2former_head.py:598-602)."""
        model, params, batch, bank, bert, step = setup
        batch = dict(batch)
        batch["num_gts"] = np.zeros_like(batch["num_gts"])
        batch["gt_labels"] = np.full_like(batch["gt_labels"], -1)
        batch["gt_masks"] = np.zeros_like(batch["gt_masks"])
        tx, _ = build_optimizer(params, OptimizerConfig())
        state = create_train_state(params, tx)
        _, metrics = step(
            state,
            {k: jnp.asarray(v) for k, v in batch.items()},
            jax.random.PRNGKey(2),
        )
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite with empty GT"
        assert float(metrics["loss_mask"]) == 0.0
        assert float(metrics["loss_dice"]) == 0.0
