"""Fusion head: embedding-similarity classification + instance/panoptic
post-processing (fully vectorized, jittable).

TPU-native equivalent of the reference ``MaskFormerFusionHeadOpen``
(open_set/models/maskformer_fusion_head.py:16-465). Differences by design:

- the reference's per-query Python loops over panoptic segments
  (:118-160) are replaced by vectorized mask algebra: the argmax over
  probability masks makes per-query pixel sets disjoint, so thing/stuff
  pasting reduces to masked sums — no sequential loop, no host sync,
- results are fixed-size (top ``max_per_image`` instances with a validity
  score) instead of ragged lists; host-side eval code filters by score.

Per-bank classification: ``softmax(query_emb @ bank^T)`` with the trailing
zero background row dropped from scores
(reference get_cls_emb_scores :297-315, instance_postprocess_emb :317-366).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.masks import mask2bbox

INSTANCE_OFFSET = 1000000  # mmdet INSTANCE_OFFSET (1e6)


class InstanceResults(NamedTuple):
    labels: jnp.ndarray  # (max_per_image,) int32 bank label index
    scores: jnp.ndarray  # (max_per_image,) float32 det score
    boxes: jnp.ndarray  # (max_per_image, 4) xyxy
    masks: jnp.ndarray  # (max_per_image, H, W) bool


def get_cls_emb_scores(cls_emb: jnp.ndarray, bank: jnp.ndarray) -> jnp.ndarray:
    """softmax(query_emb @ bank^T): (Q, num_bank_classes+1)."""
    logits = jnp.matmul(cls_emb.astype(jnp.float32), bank.T.astype(jnp.float32))
    return jax.nn.softmax(logits, axis=-1)


class SelectedInstances(NamedTuple):
    labels: jnp.ndarray  # (max_per_image,) int32 bank label index
    scores: jnp.ndarray  # (max_per_image,) float32 det score
    boxes: jnp.ndarray  # (max_per_image, 4) xyxy
    query_idx: jnp.ndarray  # (max_per_image,) int32 index into the Q masks
    valid: jnp.ndarray  # (max_per_image,) bool (False for tail padding)


def query_mask_stats(
    mask_pred: jnp.ndarray,  # (Q, H, W) logits
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-query mask statistics, computed ONCE per image and shared by
    every eval-type bank (the selection below only permutes/duplicates
    queries, so per-(query,class) stats equal per-query stats; the
    reference recomputes them per selected pair,
    maskformer_fusion_head.py:340-363).

    Returns (masks_binary (Q,H,W) bool, mask_scores (Q,), boxes (Q,4)).
    """
    masks_binary = mask_pred > 0
    mask_prob = jax.nn.sigmoid(mask_pred.astype(jnp.float32))
    pos = masks_binary.astype(jnp.float32)
    mask_scores = (mask_prob * pos).sum(axis=(1, 2)) / (
        pos.sum(axis=(1, 2)) + 1e-6
    )
    boxes = mask2bbox(masks_binary)
    return masks_binary, mask_scores, boxes


def instance_select(
    cls_emb: jnp.ndarray,  # (Q, d)
    bank: jnp.ndarray,  # (C+1, d), trailing zero background row
    mask_scores: jnp.ndarray,  # (Q,) from query_mask_stats
    boxes: jnp.ndarray,  # (Q, 4) from query_mask_stats
    max_per_image: int = 100,
) -> SelectedInstances:
    """Top-``max_per_image`` (query, class) pairs for one bank; mask data
    is referenced by ``query_idx`` instead of materializing (k, H, W)
    duplicates."""
    scores_full = get_cls_emb_scores(cls_emb, bank)  # (Q, C+1)
    scores = scores_full[:, :-1]  # drop background
    num_cls = scores.shape[-1]

    flat_scores = scores.reshape(-1)  # (Q*C,)
    k = min(max_per_image, flat_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat_scores, k)
    labels = (top_idx % num_cls).astype(jnp.int32)
    query_idx = (top_idx // num_cls).astype(jnp.int32)
    det_scores = top_scores * mask_scores[query_idx]
    sel_boxes = boxes[query_idx]
    valid = jnp.ones((k,), jnp.bool_)

    if k < max_per_image:  # pad to the static contract
        pad = max_per_image - k
        labels = jnp.pad(labels, (0, pad))
        det_scores = jnp.pad(det_scores, (0, pad))
        sel_boxes = jnp.pad(sel_boxes, ((0, pad), (0, 0)))
        query_idx = jnp.pad(query_idx, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return SelectedInstances(labels, det_scores, sel_boxes, query_idx, valid)


def upsampled_query_stats(
    mask_pred: jnp.ndarray,  # (B, Q, h, w) logits at model resolution
    out_hw: Tuple[int, int],
    mask_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Integer-factor upsample fused with the per-query statistics.

    Semantically identical to ``bilinear_resize`` followed by
    ``query_mask_stats`` (tests assert it), but the full-resolution bf16
    logit tensor — 4.3 GB at the batch-16 bench shape — is never
    materialized: the W-direction phase outputs feed the threshold, the
    score reductions and the box row/column occupancy directly, and only
    the boolean mask (1 byte/px) is written.

    Returns (masks_binary (B, Q, H, W) bool, mask_scores (B, Q),
    boxes (B, Q, 4)).
    """
    from ..ops.resize import _phase_weights, _upsample_axis_int

    b, q, h, w = mask_pred.shape
    out_h, out_w = out_hw
    assert out_h % h == 0 and out_w % w == 0, (mask_pred.shape, out_hw)
    kh, kw = out_h // h, out_w // w

    x = mask_pred.astype(mask_dtype)
    yh = _upsample_axis_int(x, kh, axis=2)  # (B, Q, H, w)
    left = jnp.concatenate([yh[..., :1], yh[..., :-1]], axis=-1)
    right = jnp.concatenate([yh[..., 1:], yh[..., -1:]], axis=-1)

    bins = []
    num = jnp.zeros((b, q), jnp.float32)
    den = jnp.zeros((b, q), jnp.float32)
    row_any = jnp.zeros((b, q, out_h), bool)
    col_any_phases = []
    for kind, wa, wb in _phase_weights(kw):
        a = left if kind == "left" else yh
        bb = yh if kind == "left" else right
        y_p = jnp.asarray(wa, x.dtype) * a + jnp.asarray(wb, x.dtype) * bb
        bp = y_p > 0  # (B, Q, H, w)
        bins.append(bp)
        prob = jax.nn.sigmoid(y_p.astype(jnp.float32))
        num = num + (prob * bp).sum(axis=(2, 3))
        den = den + bp.sum(axis=(2, 3))
        row_any = row_any | bp.any(axis=3)
        col_any_phases.append(bp.any(axis=2))  # (B, Q, w)
    # interleave phases: out col = kw * i + p
    masks_binary = jnp.stack(bins, axis=-1).reshape(b, q, out_h, out_w)
    col_any = jnp.stack(col_any_phases, axis=-1).reshape(b, q, out_w)

    mask_scores = num / (den + 1e-6)

    rows = jnp.arange(out_h, dtype=jnp.float32)
    cols = jnp.arange(out_w, dtype=jnp.float32)
    big = jnp.float32(1e9)
    y1 = jnp.min(jnp.where(row_any, rows, big), axis=2)
    y2 = jnp.max(jnp.where(row_any, rows, -big), axis=2) + 1
    x1 = jnp.min(jnp.where(col_any, cols, big), axis=2)
    x2 = jnp.max(jnp.where(col_any, cols, -big), axis=2) + 1
    nonempty = jnp.any(row_any, axis=2)
    boxes = jnp.stack([x1, y1, x2, y2], axis=2)
    boxes = jnp.where(nonempty[..., None], boxes, jnp.zeros_like(boxes))
    return masks_binary, mask_scores, boxes


def instance_postprocess_emb(
    cls_emb: jnp.ndarray,  # (Q, d)
    mask_pred: jnp.ndarray,  # (Q, H, W) logits
    bank: jnp.ndarray,  # (C+1, d), trailing zero background row
    max_per_image: int = 100,
) -> InstanceResults:
    """Open-vocabulary instance post-processing for one image."""
    masks_binary_q, mask_scores, boxes = query_mask_stats(mask_pred)
    sel = instance_select(cls_emb, bank, mask_scores, boxes, max_per_image)
    masks_binary = jnp.take(masks_binary_q, sel.query_idx, axis=0)
    # padded tail entries carry empty masks (static contract)
    masks_binary = masks_binary & sel.valid[:, None, None]
    return InstanceResults(sel.labels, sel.scores, sel.boxes, masks_binary)


def panoptic_postprocess_emb(
    cls_emb: jnp.ndarray,  # (Q, d)
    mask_pred: jnp.ndarray,  # (Q, H, W) logits
    bank: jnp.ndarray,  # (C+1, d)
    num_things_classes: int,
    object_mask_thr: float = 0.8,
    iou_thr: float = 0.8,
    filter_low_score: bool = True,
    stuff_area_limit: int = 4096,
) -> jnp.ndarray:
    """Open-set panoptic post-processing for one image.

    Returns (H, W) int32 panoptic map: ``label + instance_id * 1e6`` for
    things, bare label for stuff, ``num_bank_classes`` for void.
    """
    q, h, w = mask_pred.shape
    scores_full = get_cls_emb_scores(cls_emb, bank)  # (Q, C+1)
    num_classes = scores_full.shape[-1] - 1
    scores = scores_full.max(axis=-1)
    labels = scores_full.argmax(axis=-1).astype(jnp.int32)
    probs = jax.nn.sigmoid(mask_pred)

    keep = (labels != num_classes) & (scores > object_mask_thr)  # (Q,)
    # invalid queries get -inf prob so they never win the argmax
    weighted = jnp.where(
        keep[:, None, None], scores[:, None, None] * probs, -1.0
    )
    winner = jnp.argmax(weighted, axis=0)  # (H, W) query index
    any_valid = jnp.any(keep)

    # pass 1 (reference :118-146): the iou test uses the UNFILTERED
    # winner-region area; filter_low_score shrinks only the pasted mask
    onehot = (
        winner[None, :, :] == jnp.arange(q)[:, None, None]
    ) & keep[:, None, None]  # (Q, H, W)
    mask_area = onehot.sum(axis=(1, 2))
    original_area = (probs >= 0.5).sum(axis=(1, 2))
    seg_keep = (
        keep
        & (mask_area > 0)
        & (original_area > 0)
        & (mask_area >= iou_thr * original_area)
    )
    paste_mask = onehot & (probs >= 0.5) if filter_low_score else onehot

    is_thing = labels < num_things_classes
    thing_keep = seg_keep & is_thing
    thing_write = paste_mask & thing_keep[:, None, None]

    # pass 2 (reference :148-158): stuff pastes its UNFILTERED winner
    # region restricted to still-void pixels; the area limit applies to
    # that intersection and there is no low-score filter on stuff
    void_left = ~jnp.any(thing_write, axis=0)  # (H, W)
    stuff_mask = onehot & void_left[None, :, :]
    stuff_area = stuff_mask.sum(axis=(1, 2))
    stuff_keep = seg_keep & (~is_thing) & (stuff_area >= stuff_area_limit)
    stuff_write = stuff_mask & stuff_keep[:, None, None]

    # instance ids follow query order among pasted things (reference :146)
    instance_id = jnp.cumsum(thing_keep.astype(jnp.int32))  # 1-based at kept
    seg_value = jnp.where(
        thing_keep,
        labels + instance_id * INSTANCE_OFFSET,
        jnp.where(stuff_keep, labels, 0),
    ).astype(jnp.int32)

    write = thing_write | stuff_write
    # write regions are disjoint (subsets of disjoint argmax regions;
    # stuff is further restricted to void), so a masked sum implements
    # the reference's sequential pasting exactly
    panoptic = (write.astype(jnp.int32) * seg_value[:, None, None]).sum(axis=0)
    background = jnp.int32(num_classes)
    panoptic = jnp.where(write.any(axis=0), panoptic, background)
    return jnp.where(any_valid, panoptic, jnp.full((h, w), background, jnp.int32))


def instance_postprocess_shared(
    cls_emb: jnp.ndarray,  # (B, Q, d)
    mask_pred: jnp.ndarray,  # (B, Q, h, w) logits at model resolution
    banks: Dict[str, jnp.ndarray],  # bank_key -> (C+1, d)
    out_hw: Optional[Tuple[int, int]] = None,  # upsample target (H, W)
    max_per_image: int = 100,
    mask_dtype=jnp.bfloat16,
) -> Tuple[Dict[str, SelectedInstances], jnp.ndarray]:
    """Batched instance post-processing with the expensive full-resolution
    work (upsample, sigmoid/threshold reductions, boxes) done ONCE per
    image and shared across all eval-type banks.

    This is the TPU-first restructuring of the reference's per-eval-type
    loop (maskformer_fusion_head.py:436-450 runs the full post-processing
    three times on the same upsampled masks): upsampling runs in bf16 on
    the phase-decomposed path, per-query stats are computed in one fused
    pass, and per-bank selection only touches (Q, C) score matrices.

    Returns ({bank_key: SelectedInstances (B, ...)}, masks_binary
    (B, Q, H, W) bool — indexed by ``query_idx``).
    """
    from ..ops.resize import bilinear_resize

    h, w = mask_pred.shape[2:]
    if out_hw is not None and out_hw[0] % h == 0 and out_hw[1] % w == 0:
        # integer-factor upsample: fused path, full-res logits never hit HBM
        masks_binary, mask_scores, boxes = upsampled_query_stats(
            mask_pred, out_hw, mask_dtype
        )
    else:
        if out_hw is not None:
            mask_pred = bilinear_resize(
                mask_pred.astype(mask_dtype), out_hw[0], out_hw[1]
            )
        masks_binary, mask_scores, boxes = jax.vmap(query_mask_stats)(
            mask_pred
        )
    selected = {
        key: jax.vmap(
            lambda e, ms, bx, _bank=bank: instance_select(
                e, _bank, ms, bx, max_per_image
            )
        )(cls_emb, mask_scores, boxes)
        for key, bank in banks.items()
    }
    return selected, masks_binary


def simple_test_fusion(
    cls_emb_results: jnp.ndarray,  # (B, Q, d)
    mask_pred_results: jnp.ndarray,  # (B, Q, H, W)
    banks: Dict[str, jnp.ndarray],
    eval_types: Tuple[str, ...] = ("all_results", "novel_results", "base_results"),
    max_per_image: int = 100,
    panoptic_mode: bool = False,
    num_things_classes: int = 65,
    **panoptic_kwargs,
) -> Dict[str, Any]:
    """Batched fusion over requested eval types (reference simple_test,
    maskformer_fusion_head.py:369-464). Cropping/rescaling to original
    image sizes happens on host (evaluation/inference.py)."""
    out: Dict[str, Any] = {}
    for eval_type in eval_types:
        bank_key = eval_type.split("_")[0]  # all / novel / base
        bank = banks[bank_key]
        if eval_type == "all_results" and panoptic_mode:
            out["panoptic_all_results"] = jax.vmap(
                lambda e, m: panoptic_postprocess_emb(
                    e, m, bank, num_things_classes, **panoptic_kwargs
                )
            )(cls_emb_results, mask_pred_results)
        else:
            out[eval_type] = jax.vmap(
                lambda e, m, _bank=bank: instance_postprocess_emb(
                    e, m, _bank, max_per_image
                )
            )(cls_emb_results, mask_pred_results)
    return out


class FusionHeadOpen:
    """Thin object wrapper bundling banks + test-time config."""

    def __init__(
        self,
        banks: Dict[str, jnp.ndarray],
        num_things_classes: int,
        eval_types=("all_results", "novel_results", "base_results"),
        max_per_image: int = 100,
        panoptic_mode: bool = False,
        object_mask_thr: float = 0.8,
        iou_thr: float = 0.8,
        filter_low_score: bool = True,
        stuff_area_limit: int = 4096,
    ):
        self.banks = banks
        self.num_things_classes = num_things_classes
        self.eval_types = tuple(eval_types)
        self.max_per_image = max_per_image
        self.panoptic_mode = panoptic_mode
        self.panoptic_kwargs = dict(
            object_mask_thr=object_mask_thr,
            iou_thr=iou_thr,
            filter_low_score=filter_low_score,
            stuff_area_limit=stuff_area_limit,
        )

    def __call__(self, cls_emb_results, mask_pred_results):
        return simple_test_fusion(
            cls_emb_results,
            mask_pred_results,
            self.banks,
            eval_types=self.eval_types,
            max_per_image=self.max_per_image,
            panoptic_mode=self.panoptic_mode,
            num_things_classes=self.num_things_classes,
            **self.panoptic_kwargs,
        )
