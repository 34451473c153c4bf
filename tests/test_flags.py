"""Behavior-flag parity: use_caption_align + freeze_pretrained/freeze_v2l.

The last §5 flag-inventory items (VERDICT round-4 missing #6). The align
loss is golden-tested against the reference's own torch grounding module
(the only in-tree loss matching the call-site contract at
/root/reference/open_set/models/mask2former_head.py:583-589 — the flag
is off in every shipped reference config and its loss module is built
from config, never shipped); the freeze knobs mirror
mask2former_head.py:242-247,262-271 as optimizer masks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from betrayed_by_captions_tpu.engine.optim import (
    OptimizerConfig,
    label_params,
)
from betrayed_by_captions_tpu.losses.criterion import (
    CriterionConfig,
    compute_losses,
)


def _toy_inputs(rng, b=3, q=5, layers=2, c=2, d=8, hw=16, t=6, vocab=50):
    outputs = {
        "cls_scores": jnp.asarray(rng.randn(layers, b, q, c + 1), jnp.float32),
        "cls_emb_preds": jnp.asarray(rng.randn(layers, b, q, d), jnp.float32),
        "mask_preds": jnp.asarray(
            rng.randn(layers, b, q, hw // 4, hw // 4), jnp.float32
        ),
    }
    batch = {
        "gt_labels": jnp.asarray(rng.randint(0, c, (b, 4)), jnp.int32),
        "gt_masks": jnp.asarray(rng.rand(b, 4, hw, hw) > 0.5, jnp.float32),
        "num_gts": jnp.asarray([2, 4, 1], jnp.int32),
        "caption_ids": jnp.asarray(rng.randint(1, vocab, (b, t)), jnp.int32),
        "caption_mask": jnp.ones((b, t), jnp.int32),
        "caption_nouns_ids": jnp.asarray(
            rng.randint(1, vocab, (b, t)), jnp.int32
        ),
        "caption_nouns_mask": jnp.asarray(
            (rng.rand(b, t) > 0.3), jnp.int32
        ),
    }
    table = jnp.asarray(rng.randn(vocab, d), jnp.float32)
    bank = jnp.asarray(rng.randn(c + 1, d), jnp.float32)
    return outputs, batch, table, bank


def test_caption_align_golden_vs_reference_grounding(rng):
    """loss_caption_align must equal the reference torch grounding math
    applied to the LOCAL batch's (queries, noun embeddings) at the
    criterion temperature — per decoder layer, last layer unprefixed."""
    from tests.test_reference_golden import _install_mm_stubs, _load

    _install_mm_stubs()
    gl = _load(
        "ref_align_gl",
        "/root/reference/open_set/models/losses/grounding_loss.py",
    )

    outputs, batch, table, bank = _toy_inputs(rng)
    cfg = CriterionConfig(
        num_classes=2,
        num_points=16,
        use_caption=False,
        use_caption_generation=False,
        use_caption_align=True,
        loss_caption_align=1.0,
        softmax_temperature=10.0,
    )
    embed = lambda ids: jnp.take(table, ids, axis=0)
    _, losses = compute_losses(
        jax.random.PRNGKey(0), outputs, batch, bank, cfg, caption_embed=embed
    )
    assert "loss_caption_align" in losses
    assert "d0.loss_caption_align" in losses

    nouns_embs = np.asarray(embed(batch["caption_nouns_ids"]))
    for li, key in [(1, "loss_caption_align"), (0, "d0.loss_caption_align")]:
        want = gl.grounding_loss(
            torch.from_numpy(np.asarray(outputs["cls_emb_preds"][li])),
            torch.from_numpy(nouns_embs),
            torch.from_numpy(
                np.asarray(batch["caption_nouns_mask"], np.float32)
            ),
            10.0,
        )
        np.testing.assert_allclose(
            float(losses[key]), float(want), rtol=1e-5, atol=1e-5
        )


def test_caption_align_default_off(rng):
    outputs, batch, table, bank = _toy_inputs(rng)
    cfg = CriterionConfig(
        num_classes=2, num_points=16,
        use_caption=False, use_caption_generation=False,
    )
    _, losses = compute_losses(
        jax.random.PRNGKey(0), outputs, batch, bank, cfg
    )
    assert not any("caption_align" in k for k in losses)


def _fake_params():
    leaf = lambda: jnp.zeros((2,))
    return {
        "head": {
            "pixel_decoder": {"lateral0": {"kernel": leaf()}},
            "decoder_layer0": {"self_attn": {"kernel": leaf()}},
            "post_norm": {"scale": leaf()},
            "v2l_transform": {"kernel": leaf(), "bias": leaf()},
            "cls_embed": {"kernel": leaf()},
            "mask_embed": {"dense0": {"kernel": leaf()}},
        },
        "backbone": {"layer4_block0": {"conv1": {"kernel": leaf()}}},
    }


@pytest.mark.parametrize(
    "flag,frozen_paths,trainable_paths",
    [
        (
            dict(freeze_pretrained=True),
            [
                ("head", "pixel_decoder", "lateral0", "kernel"),
                ("head", "decoder_layer0", "self_attn", "kernel"),
                ("head", "post_norm", "scale"),
            ],
            [
                ("head", "v2l_transform", "kernel"),
                ("head", "cls_embed", "kernel"),
                ("head", "mask_embed", "dense0", "kernel"),
            ],
        ),
        (
            dict(freeze_v2l=True),
            [("head", "v2l_transform", "kernel"),
             ("head", "v2l_transform", "bias")],
            [("head", "pixel_decoder", "lateral0", "kernel"),
             ("head", "cls_embed", "kernel")],
        ),
    ],
)
def test_freeze_flags_label_params(flag, frozen_paths, trainable_paths):
    cfg = OptimizerConfig(frozen_backbone_stages=-1, **flag)
    labels = label_params(_fake_params(), cfg)

    def get(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    for p in frozen_paths:
        assert get(labels, p) == "frozen", (flag, p)
    for p in trainable_paths:
        assert get(labels, p) != "frozen", (flag, p)


def test_freeze_flags_default_off():
    cfg = OptimizerConfig(frozen_backbone_stages=-1)
    labels = label_params(_fake_params(), cfg)
    assert labels["head"]["pixel_decoder"]["lateral0"]["kernel"] != "frozen"
    assert labels["head"]["v2l_transform"]["kernel"] != "frozen"
