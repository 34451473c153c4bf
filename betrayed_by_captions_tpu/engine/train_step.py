"""The jitted train / eval steps.

TPU-native replacement for the reference's runner iteration
(mmcv EpochBasedRunner.train -> model.train_step -> OptimizerHook;
SURVEY.md §3.1): ONE pjit-compiled function covers forward, target
assignment (on-device Hungarian), all losses, backward, grad clip and the
AdamW update. Data parallelism: inputs arrive batch-sharded over the
``data`` mesh axis; parameters are replicated; XLA inserts the gradient
reductions and the grounding loss's cross-device gathers.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..losses.criterion import CriterionConfig, compute_losses
from ..models.bert import BertWordEmbeddings
from .train_state import TrainState


def make_train_step(
    model,
    criterion_cfg: CriterionConfig,
    train_bank,
    bert: Optional[BertWordEmbeddings] = None,
    donate: bool = True,
):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics)."""
    train_bank = jnp.asarray(train_bank)

    def loss_fn(params, batch, rng):
        outputs = model.apply({"params": params}, batch["image"])

        caption_apply = None
        caption_embed = None
        if criterion_cfg.use_caption or criterion_cfg.use_caption_generation:
            assert bert is not None, "caption losses need BERT embeddings"
            caption_embed = lambda ids: bert(ids, layer_norm=True)
        if criterion_cfg.use_caption_generation:

            def caption_apply(tgt_embs, memory, pad_mask, drop_rng):
                _, logits = model.apply(
                    {"params": params},
                    tgt_embs,
                    memory,
                    pad_mask,
                    False,  # deterministic
                    method="caption_forward",
                    rngs={"dropout": drop_rng},
                )
                return logits

        total, loss_dict = compute_losses(
            rng,
            outputs,
            batch,
            train_bank,
            criterion_cfg,
            caption_apply=caption_apply,
            caption_embed=caption_embed,
        )
        return total, loss_dict

    def train_step(state: TrainState, batch, rng):
        (total, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        new_state = state.apply_gradients(grads)
        metrics = {"loss": total, **loss_dict}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, input_hw: Optional[Tuple[int, int]] = None):
    """Jitted inference: images -> last-layer (cls, emb, masks) with masks
    upsampled to the padded input resolution (reference simple_test,
    mask2former_head.py:923-964)."""

    from ..ops.resize import bilinear_resize

    @jax.jit
    def eval_step(params, images):
        outputs = model.apply({"params": params}, images)
        cls = outputs["cls_scores"][-1]
        emb = outputs["cls_emb_preds"][-1]
        masks = outputs["mask_preds"][-1]
        h, w = (
            input_hw if input_hw is not None else (images.shape[1], images.shape[2])
        )
        masks = bilinear_resize(masks, h, w)
        return {"cls_scores": cls, "cls_emb_preds": emb, "mask_preds": masks}

    return eval_step
