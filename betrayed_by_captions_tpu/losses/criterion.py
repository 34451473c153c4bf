"""Training criterion: on-device target assignment + all CGG losses,
batched over images AND decoder layers.

TPU-native re-design of the reference's loss stack
(open_set/models/mask2former_head.py:273-629). Key differences, by design:

- the reference loops ``loss_single`` over 10 decoder outputs and
  ``_get_target_single`` over images, round-tripping every cost matrix to CPU
  scipy (mask_hungarian_assigner.py:126-135); here the whole pipeline —
  point sampling, cost matrices, Hungarian matching, loss reductions — is
  vmapped over (layers x images) inside the jitted train step,
- variable-length GT lists become fixed-size arrays + validity masks
  (``num_gts``), so shapes are static,
- data parallelism is explicit, not partitioner-inferred: with
  ``axis_name`` set (the train step runs this under ``jax.shard_map``
  over the data mesh axis), matching and per-image losses stay
  device-local, the grounding loss all_gathers query/noun embeddings over
  the axis (exactly the reference's ``dist.all_gather``,
  mask2former_head.py:650-684), and every normalizer (num_total_masks,
  class-weight avg factors, caption token counts) is a cross-device psum
  — so each loss value equals the single-device global-batch value
  bit-for-bit (per-image RNG keys are folded from global image indices).
  The data-dependent Hungarian while-loop therefore never interacts with
  a collective (the round-1 8-device rendezvous deadlock).

Cost terms match configs/instance/coco_b48n17.py:171-176 (cls 0.0,
cls_emb 2.0, mask/BCE 5.0, dice 5.0); loss weights match :102-142.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.hungarian import hungarian_assign
from ..ops.point_sample import point_sample
from ..ops.uncertainty import get_uncertain_point_coords_with_randomness
from .cross_entropy import (
    binary_ce_with_logits,
    ignore_index_ce_sum,
    weighted_softmax_ce_sum,
)
from .dice import naive_dice_loss
from .grounding import grounding_loss


@dataclasses.dataclass(frozen=True)
class CriterionConfig:
    num_classes: int = 48
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    softmax_temperature: float = 10.0
    bg_class_weight: float = 0.1
    # Hungarian cost weights
    cost_cls: float = 0.0
    cost_cls_emb: float = 2.0
    cost_mask: float = 5.0
    cost_dice: float = 5.0
    # loss weights
    loss_cls: float = 0.0
    loss_cls_emb: float = 2.0
    loss_grounding: float = 2.0
    loss_caption_align: float = 2.0
    loss_caption_generation: float = 2.0
    loss_mask: float = 5.0
    loss_dice: float = 5.0
    dice_eps: float = 1.0
    # behavior flags (reference mask2former_head.py:175-194)
    use_class_emb: bool = True
    use_caption: bool = True
    # reference mask2former_head.py:583-589: a LOCAL-batch (no gather)
    # contrastive alignment between query embeddings and caption-noun
    # embeddings. Off in every shipped reference config; the reference
    # builds the module from cfg (never shipped) and its call site passes
    # no temperature, so the concrete loss is underdetermined there — we
    # pin it to the grounding InfoNCE math at the criterion temperature.
    use_caption_align: bool = False
    use_caption_generation: bool = True
    class_agnostic: bool = False
    loss_only_last: bool = False
    loss_aux_weight: float = 1.0
    gen_only_obj_nouns: bool = False
    gen_mask_obj_nouns: bool = False
    gen_replace_obj_nouns: bool = False
    object_token_id: int = 4874  # BERT id for 'object' (reference :575)
    # TPU-first knob: point-sample GT masks from an exact bilinear
    # k-times downsample instead of full resolution. 1 = reference-exact
    # (mask2former_head.py:609-613 samples full-res GT). Full-res GT
    # sampling is ~2.2 s/step of MXU einsums at batch-4 1024^2 (round-3
    # trace); k=4 samples at the mask-logit stride instead (~16x less),
    # softening loss targets only at instance boundaries.
    gt_point_downsample: int = 1
    # parity knob: run point sampling of mask logits / GT targets in f32
    # instead of the model compute dtype (bf16). The bf16 path quantizes
    # matching costs and boundary targets slightly relative to the
    # reference's f32 math; set True for reference-parity
    # training/verification runs to eliminate that variable.
    point_sample_f32: bool = False

    @property
    def sample_dtype(self):
        return jnp.float32 if self.point_sample_f32 else None


def _match_costs(
    cls_scores: jnp.ndarray,  # (Q, C+1)
    cls_emb_logits: Optional[jnp.ndarray],  # (Q, C+1)
    mask_pts: jnp.ndarray,  # (Q, P) logits
    gt_labels: jnp.ndarray,  # (G,) padded
    gt_pts: jnp.ndarray,  # (G, P) {0,1}
    cfg: CriterionConfig,
) -> jnp.ndarray:
    """Weighted matching cost matrix (G, Q) for one image."""
    p = mask_pts.shape[-1]
    gt_safe = jnp.clip(gt_labels, 0, cls_scores.shape[-1] - 1)

    cost = jnp.zeros((gt_labels.shape[0], cls_scores.shape[0]), jnp.float32)
    if cfg.cost_cls != 0.0:
        probs = jax.nn.softmax(cls_scores.astype(jnp.float32), axis=-1)
        cost += cfg.cost_cls * (-probs[:, gt_safe].T)
    if cfg.cost_cls_emb != 0.0 and cls_emb_logits is not None:
        probs = jax.nn.softmax(cls_emb_logits.astype(jnp.float32), axis=-1)
        cost += cfg.cost_cls_emb * (-probs[:, gt_safe].T)
    if cfg.cost_mask != 0.0:
        # BCE cost decomposed into two matmuls (MXU-friendly)
        pos = binary_ce_with_logits(mask_pts, jnp.ones_like(mask_pts))
        neg = binary_ce_with_logits(mask_pts, jnp.zeros_like(mask_pts))
        t = gt_pts.astype(jnp.float32)
        bce = (t @ pos.T + (1.0 - t) @ neg.T) / p  # (G, Q)
        cost += cfg.cost_mask * bce
    if cfg.cost_dice != 0.0:
        prob = jax.nn.sigmoid(mask_pts.astype(jnp.float32))
        num = 2.0 * (gt_pts.astype(jnp.float32) @ prob.T)
        den = gt_pts.sum(axis=1)[:, None] + prob.sum(axis=1)[None, :]
        dice = 1.0 - (num + cfg.dice_eps) / (den + cfg.dice_eps)
        cost += cfg.cost_dice * dice
    return cost


def _assign_layer(
    rng: jax.Array,
    cls_scores: jnp.ndarray,  # (B, Q, C+1)
    cls_emb_logits: Optional[jnp.ndarray],
    mask_preds: jnp.ndarray,  # (B, Q, h, w)
    gt_labels: jnp.ndarray,  # (B, G)
    gt_masks: jnp.ndarray,  # (B, G, H, W)
    num_gts: jnp.ndarray,  # (B,)
    cfg: CriterionConfig,
    img_idx: jnp.ndarray,  # (B,) global image indices for RNG folding
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hungarian assignment for one decoder layer over the batch.

    Returns (labels (B, Q), mask_weights (B, Q), assigned (B, Q))."""
    # per-image keys derive from the GLOBAL image index, so data-parallel
    # shards draw the same points as a single-device global-batch run
    keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(img_idx)

    def per_image(key, cls_s, emb_l, mask_p, g_labels, g_masks, n):
        coords = jax.random.uniform(key, (cfg.num_points, 2))
        # sample in the mask dtype (or f32 with point_sample_f32), cast
        # the (Q, P)-sized results to f32
        dt = cfg.sample_dtype or mask_p.dtype
        mask_pts = point_sample(mask_p.astype(dt), coords).astype(jnp.float32)
        gt_pts = point_sample(
            g_masks.astype(dt), coords
        ).astype(jnp.float32)  # (G, P)
        cost = _match_costs(cls_s, emb_l, mask_pts, g_labels, gt_pts, cfg)
        return hungarian_assign(cost, n)  # (Q,) gt-or--1

    if cls_emb_logits is None:
        assigned = jax.vmap(
            lambda k, c, m, gl, gm, n: per_image(k, c, None, m, gl, gm, n)
        )(keys, cls_scores, mask_preds, gt_labels, gt_masks, num_gts)
    else:
        assigned = jax.vmap(per_image)(
            keys, cls_scores, cls_emb_logits, mask_preds, gt_labels, gt_masks, num_gts
        )

    matched = assigned >= 0
    safe = jnp.clip(assigned, 0, gt_labels.shape[1] - 1)
    labels = jnp.where(
        matched, jnp.take_along_axis(gt_labels, safe, axis=1), cfg.num_classes
    )
    return labels, matched, safe


def _mask_losses(
    rng: jax.Array,
    mask_preds: jnp.ndarray,  # (B, Q, h, w) logits
    gt_masks: jnp.ndarray,  # (B, G, H, W)
    matched: jnp.ndarray,  # (B, Q) bool
    assigned: jnp.ndarray,  # (B, Q) clipped gt index
    num_total_masks: jnp.ndarray,
    cfg: CriterionConfig,
    img_idx: jnp.ndarray,  # (B,) global image indices
    psum: Callable[[jnp.ndarray], jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Point-sampled dice + BCE losses (reference :591-627).

    Numerators are psum'd across the data axis; ``num_total_masks`` is
    already global, so loss values are data-parallel invariant."""
    b, q, h, w = mask_preds.shape
    keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(img_idx)
    coords = jax.vmap(
        lambda k, m: get_uncertain_point_coords_with_randomness(
            k,
            jax.lax.stop_gradient(m),
            cfg.num_points,
            cfg.oversample_ratio,
            cfg.importance_sample_ratio,
        )
    )(keys, mask_preds)  # (B, Q, P, 2)
    coords = coords.reshape(b * q, cfg.num_points, 2)

    dt = cfg.sample_dtype or mask_preds.dtype
    flat_preds = mask_preds.reshape(b * q, h, w).astype(dt)
    pred_pts = (
        point_sample(flat_preds, coords)
        .reshape(b, q, cfg.num_points)
        .astype(jnp.float32)
    )

    # gather each query's matched GT mask and sample the same points;
    # sampling runs in the mask compute dtype (GT is exactly 0/1, and a
    # full-res f32 per-query gather would be 1.7 GB/layer at batch 4)
    # unless point_sample_f32 requests reference-parity f32 math
    gt_per_query = jnp.take_along_axis(
        gt_masks, assigned[:, :, None, None], axis=1
    )  # (B, Q, H, W)
    tgt_pts = (
        point_sample(
            gt_per_query.reshape(
                b * q, *gt_per_query.shape[2:]
            ).astype(dt),
            coords,
        )
        .reshape(b, q, cfg.num_points)
        .astype(jnp.float32)
    )

    wgt = matched.astype(jnp.float32)  # (B, Q)
    dice = naive_dice_loss(
        pred_pts.reshape(b * q, -1), tgt_pts.reshape(b * q, -1), cfg.dice_eps
    ).reshape(b, q)
    loss_dice = psum((dice * wgt).sum()) / num_total_masks

    bce = binary_ce_with_logits(pred_pts, tgt_pts)  # (B, Q, P)
    loss_mask = psum((bce * wgt[:, :, None]).sum()) / (
        num_total_masks * cfg.num_points
    )
    return loss_mask, loss_dice


def _caption_generation_targets(
    caption_ids: jnp.ndarray,  # (B, T)
    nouns_ids: jnp.ndarray,  # (B, Tn)
    nouns_mask: jnp.ndarray,  # (B, Tn)
    cfg: CriterionConfig,
) -> jnp.ndarray:
    """Apply the gen_* target-munging flags (reference :561-575)."""
    if not (cfg.gen_only_obj_nouns or cfg.gen_mask_obj_nouns or cfg.gen_replace_obj_nouns):
        return caption_ids
    valid_nouns = (nouns_ids * nouns_mask.astype(nouns_ids.dtype))[:, None, :]
    is_noun = jnp.any(
        (caption_ids[:, :, None] == valid_nouns) & (valid_nouns != 0), axis=-1
    )
    ids = caption_ids
    if cfg.gen_only_obj_nouns:
        ids = jnp.where(is_noun, ids, 0)
    if cfg.gen_mask_obj_nouns:
        # zero out the first noun occurrence per caption
        first = jnp.argmax(is_noun, axis=1)
        has = jnp.any(is_noun, axis=1)
        onehot = jax.nn.one_hot(first, ids.shape[1], dtype=bool) & has[:, None]
        ids = jnp.where(onehot, 0, ids)
    if cfg.gen_replace_obj_nouns:
        ids = jnp.where(is_noun, cfg.object_token_id, ids)
    return ids


def compute_losses(
    rng: jax.Array,
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    train_bank: jnp.ndarray,  # (C+1, d)
    cfg: CriterionConfig,
    caption_apply: Optional[Callable] = None,
    caption_embed: Optional[Callable] = None,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """All losses over all decoder layers.

    Args:
        outputs: head outputs — cls_scores (L, B, Q, C+1),
            cls_emb_preds (L, B, Q, d), mask_preds (L, B, Q, h, w).
        batch: gt_labels (B, G) int32 (pad -1), gt_masks (B, G, H, W),
            num_gts (B,), caption_ids/caption_mask (B, T),
            caption_nouns_ids/caption_nouns_mask (B, Tn).
        train_bank: base-class embedding bank incl. zero bg row.
        caption_apply: fn(tgt_embs, memory, pad_mask, rng) -> logits
            (teacher-forced caption decoder pass, bound to model params).
        caption_embed: fn(ids) -> (.., d) BERT embedding lookup (+LN).
        axis_name: data-parallel mesh axis when running under
            ``jax.shard_map`` (each device sees its local batch shard);
            None for single-device / global-batch execution. With an axis,
            normalizers are psum'd and grounding all_gathers, so every
            returned loss equals the single-device global-batch value.

    Returns (total_loss, per-loss dict incl. per-layer aux entries).
    """
    psum = (
        (lambda x: jax.lax.psum(x, axis_name))
        if axis_name is not None
        else (lambda x: x)
    )

    # learnable softmax temperature overrides the static config value
    # when the model exposes it (reference mask2former_head.py:228-229)
    temperature = outputs.get(
        "softmax_temperature", jnp.float32(cfg.softmax_temperature)
    )
    temperature = jnp.reshape(temperature, ())

    cls_scores = outputs["cls_scores"].astype(jnp.float32)
    cls_emb_preds = outputs["cls_emb_preds"].astype(jnp.float32)
    # mask_preds stay in the model's compute dtype: upcasting the
    # (L, B, Q, h, w) deep-supervision stack to f32 doubles it to ~10 GB
    # at batch-4 1024^2 training; loss math casts AFTER point sampling
    mask_preds = outputs["mask_preds"]
    num_layers = cls_scores.shape[0]

    gt_labels = batch["gt_labels"]
    gt_masks = batch["gt_masks"]
    num_gts = batch["num_gts"]
    if cfg.gt_point_downsample > 1:
        from ..ops.resize import bilinear_resize

        k = cfg.gt_point_downsample
        bsz, g, gh, gw = gt_masks.shape
        # one exact bilinear downsample per step; all point sampling then
        # reads the small copy at the same normalized coords
        gt_masks = bilinear_resize(
            gt_masks.astype(cfg.sample_dtype or mask_preds.dtype),
            gh // k,
            gw // k,
        )

    b_local = gt_labels.shape[0]
    offset = (
        jax.lax.axis_index(axis_name) * b_local if axis_name is not None else 0
    )
    img_idx = offset + jnp.arange(b_local)  # (B,) global image indices

    class_weight = jnp.concatenate(
        [jnp.ones((cfg.num_classes,)), jnp.array([cfg.bg_class_weight])]
    )
    num_total_masks = jnp.maximum(psum(num_gts.sum().astype(jnp.float32)), 1.0)

    if cfg.use_class_emb:
        # (L, B, Q, C+1)
        cls_emb_logits = (
            jnp.einsum("lbqd,cd->lbqc", cls_emb_preds, train_bank)
            / temperature
        )
    else:
        cls_emb_logits = None

    # caption word embeddings (frozen BERT table)
    if cfg.use_caption or cfg.use_caption_generation or cfg.use_caption_align:
        assert caption_embed is not None
        caption_embs = caption_embed(batch["caption_ids"])  # (B, T, d)
        nouns_embs = caption_embed(batch["caption_nouns_ids"])  # (B, Tn, d)

    if cfg.use_caption:
        # the grounding loss is a global-batch BxB contrastive term: gather
        # noun embeddings/masks and (per layer) query embeddings over the
        # data axis (the reference's dist.all_gather,
        # mask2former_head.py:650-684)
        if axis_name is not None:
            g_nouns_embs = jax.lax.all_gather(
                nouns_embs, axis_name, tiled=True
            )
            g_nouns_mask = jax.lax.all_gather(
                batch["caption_nouns_mask"], axis_name, tiled=True
            )
            g_emb_preds = jax.lax.all_gather(
                cls_emb_preds, axis_name, axis=1, tiled=True
            )  # (L, B_global, Q, d)
        else:
            g_nouns_embs = nouns_embs
            g_nouns_mask = batch["caption_nouns_mask"]
            g_emb_preds = cls_emb_preds

    layer_keys = jax.random.split(rng, num_layers * 3).reshape(num_layers, 3, 2)

    def layer_losses(li: int):
        k_assign, k_points, k_drop = (
            layer_keys[li, 0],
            layer_keys[li, 1],
            layer_keys[li, 2],
        )
        emb_logits_l = None if cls_emb_logits is None else cls_emb_logits[li]
        labels, matched, assigned = _assign_layer(
            k_assign,
            cls_scores[li],
            emb_logits_l,
            mask_preds[li],
            gt_labels,
            gt_masks,
            num_gts,
            cfg,
            img_idx,
        )
        flat_labels = labels.reshape(-1)
        avg_factor = jnp.maximum(
            psum(jnp.take(class_weight, flat_labels).sum()), 1e-12
        )

        loss_cls = (
            psum(
                weighted_softmax_ce_sum(
                    cls_scores[li].reshape(-1, cfg.num_classes + 1),
                    flat_labels,
                    class_weight=class_weight,
                )
            )
            / avg_factor
        )
        losses = {"loss_cls": cfg.loss_cls * loss_cls}

        if cfg.use_class_emb:
            losses["loss_cls_emb"] = cfg.loss_cls_emb * (
                psum(
                    weighted_softmax_ce_sum(
                        emb_logits_l.reshape(-1, cfg.num_classes + 1),
                        flat_labels,
                        class_weight=class_weight,
                    )
                )
                / avg_factor
            )

        if cfg.use_caption:
            # computed identically on every device from gathered tensors;
            # gradients route back through the all_gather transpose
            losses["loss_grounding"] = cfg.loss_grounding * grounding_loss(
                g_emb_preds[li],
                g_nouns_embs,
                g_nouns_mask,
                temperature,
            )

        if cfg.use_caption_align:
            # local-batch alignment: unlike loss_grounding, the reference
            # computes this on the DEVICE-LOCAL cls_emb_preds (:583-586,
            # no gather_captions_and_preds), so a data-parallel run's
            # value is the mean of per-device local-batch losses
            align = grounding_loss(
                cls_emb_preds[li],
                nouns_embs,
                batch["caption_nouns_mask"],
                temperature,
            )
            losses["loss_caption_align"] = cfg.loss_caption_align * (
                psum(align)
                / (jax.lax.psum(1, axis_name) if axis_name is not None else 1)
            )

        if cfg.use_caption_generation:
            assert caption_apply is not None
            tgt_ids = _caption_generation_targets(
                batch["caption_ids"],
                batch["caption_nouns_ids"],
                batch["caption_nouns_mask"],
                cfg,
            )
            pad_mask = ~(batch["caption_mask"][:, :-1].astype(bool))
            logits = caption_apply(
                caption_embs[:, :-1, :], cls_emb_preds[li], pad_mask, k_drop
            )  # (B, T-1, V)
            ce_sum, valid_cnt = ignore_index_ce_sum(
                logits.reshape(-1, logits.shape[-1]),
                tgt_ids[:, 1:].reshape(-1),
                ignore_index=0,
            )
            losses["loss_caption_generation"] = cfg.loss_caption_generation * (
                psum(ce_sum) / jnp.maximum(psum(valid_cnt), 1)
            )

        loss_mask, loss_dice = _mask_losses(
            k_points,
            mask_preds[li],
            gt_masks,
            matched,
            assigned,
            num_total_masks,
            cfg,
            img_idx,
            psum,
        )
        losses["loss_mask"] = cfg.loss_mask * loss_mask
        losses["loss_dice"] = cfg.loss_dice * loss_dice
        return losses

    # deep supervision: the last layer reports unprefixed keys; earlier
    # layers are d{i}.* with aux weight (reference loss(), :439-462)
    loss_dict: Dict[str, jnp.ndarray] = {}
    layer_ids = (
        [num_layers - 1]
        if cfg.loss_only_last
        else list(range(num_layers))
    )
    for li in layer_ids:
        lds = layer_losses(li)
        if li == num_layers - 1:
            loss_dict.update(lds)
        else:
            for k, v in lds.items():
                loss_dict[f"d{li}.{k}"] = v * cfg.loss_aux_weight

    total = sum(loss_dict.values())
    return total, loss_dict
