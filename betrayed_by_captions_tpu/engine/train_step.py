"""The jitted train / eval steps.

TPU-native replacement for the reference's runner iteration
(mmcv EpochBasedRunner.train -> model.train_step -> OptimizerHook;
SURVEY.md §3.1): ONE pjit-compiled function covers forward, target
assignment (on-device Hungarian), all losses, backward, grad clip and the
AdamW update.

Data parallelism is explicit SPMD via ``jax.shard_map`` (pass ``mesh``):
the per-device body runs forward + matching + losses on its local batch
shard with manually-placed collectives — an ``all_gather`` for the
grounding loss's global BxB contrastive matrix, ``psum`` for loss
normalizers and the gradient reduction. Nothing is left to the SPMD
partitioner, so the data-dependent Hungarian while-loop can never end up
straddling a collective (the round-1 8-device rendezvous deadlock).
Every loss value equals the single-device global-batch value exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses.criterion import CriterionConfig, compute_losses
from ..models.bert import BertWordEmbeddings
from .train_state import TrainState


def make_train_step(
    model,
    criterion_cfg: CriterionConfig,
    train_bank,
    bert: Optional[BertWordEmbeddings] = None,
    donate: bool = True,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    caption_dropout: bool = True,
):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    Args:
        mesh: if given, run data-parallel over ``axis_name`` via shard_map
            (batch sharded on its leading dim, params/opt state replicated).
        caption_dropout: disable to make the caption decoder deterministic
            (the 1-device == n-device equality test uses this: dropout
            masks are drawn per local batch, the only non-invariant RNG).
    """
    train_bank = jnp.asarray(train_bank)

    def loss_fn(params, batch, rng, axis=None):
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
                    not caption_dropout,  # deterministic flag
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
            axis_name=axis,
        )
        return total, loss_dict

    if mesh is None:

        def train_step(state: TrainState, batch, rng):
            (total, loss_dict), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, batch, rng)
            new_state = state.apply_gradients(grads)
            metrics = {"loss": total, **loss_dict}
            return new_state, metrics

        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    # ---- explicit-SPMD data-parallel path ----
    def device_grads(params, batch, rng):
        (total, loss_dict), grads = jax.value_and_grad(
            partial(loss_fn, axis=axis_name), has_aux=True
        )(params, batch, rng)
        # loss values are already global (psum'd normalizers inside);
        # pmean is a numeric no-op that marks them replicated. Grad terms
        # are per-device shards of the global gradient -> psum.
        grads = jax.lax.psum(grads, axis_name)
        total = jax.lax.pmean(total, axis_name)
        loss_dict = jax.lax.pmean(loss_dict, axis_name)
        return total, loss_dict, grads

    # check_vma=False: the Hungarian JV solver's while_loop carries mix
    # varying (cost-derived) and unvarying (counter/index) values, which the
    # varying-manual-axes type checker rejects; the collective semantics
    # (psum/all_gather placed manually below and in the criterion) do not
    # depend on the checker.
    sharded_grads = jax.shard_map(
        device_grads,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P()),
        out_specs=P(),
        check_vma=False,
    )

    def train_step(state: TrainState, batch, rng):
        total, loss_dict, grads = sharded_grads(state.params, batch, rng)
        new_state = state.apply_gradients(grads)
        metrics = {"loss": total, **loss_dict}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model,
    input_hw: Optional[Tuple[int, int]] = None,
    upsample: bool = True,
):
    """Jitted inference: images -> last-layer (cls, emb, masks) with masks
    upsampled to the padded input resolution (reference simple_test,
    mask2former_head.py:923-964). Pass ``upsample=False`` to keep masks at
    model (stride-4) resolution — the fused post-processing path
    (fusion_head.instance_postprocess_shared) upsamples in bf16 itself."""

    from ..ops.resize import bilinear_resize

    @jax.jit
    def eval_step(params, images):
        # only_last: intermediate decoder layers produce just their
        # attention masks (level-resolution einsum); the full-res mask
        # einsum/stack runs for the final layer alone
        outputs = model.apply({"params": params}, images, only_last=True)
        cls = outputs["cls_scores"][-1]
        emb = outputs["cls_emb_preds"][-1]
        masks = outputs["mask_preds"][-1]
        if upsample:
            h, w = (
                input_hw
                if input_hw is not None
                else (images.shape[1], images.shape[2])
            )
            masks = bilinear_resize(masks, h, w)
        return {"cls_scores": cls, "cls_emb_preds": emb, "mask_preds": masks}

    return eval_step
