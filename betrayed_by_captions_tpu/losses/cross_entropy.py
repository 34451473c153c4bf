"""Cross-entropy loss family (pure JAX, masked static shapes).

TPU-native equivalent of the reference's ``CrossEntropyLossOpen``
(open_set/models/losses/cross_entropy_loss.py:252-356) covering the three
modes the shipped configs use:

- softmax CE with per-class weights and an explicit ``avg_factor``
  (classification / embedding-classification losses),
- softmax CE with ``ignore_index`` and mean-over-non-ignored reduction
  (caption generation loss, ignore_index=0),
- sigmoid binary CE on mask points with ``avg_factor``.

The reference's variable-length label lists become masks over fixed-size
arrays; every reduction is an explicit masked sum / avg_factor.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element CE: logits (..., C) fp32, labels (...) int. No reduction."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    return -picked


def weighted_softmax_ce_loss(
    logits: jnp.ndarray,  # (N, C)
    labels: jnp.ndarray,  # (N,)
    class_weight: Optional[jnp.ndarray] = None,  # (C,)
    sample_weight: Optional[jnp.ndarray] = None,  # (N,)
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Class-weighted CE with avg_factor reduction (torch F.cross_entropy
    ``weight=`` semantics: per-element loss scaled by class_weight[label])."""
    ce = softmax_cross_entropy(logits, labels)
    if class_weight is not None:
        ce = ce * jnp.take(class_weight, labels)
    if sample_weight is not None:
        ce = ce * sample_weight
    total = ce.sum()
    if avg_factor is None:
        return total / ce.size
    return total / jnp.maximum(avg_factor, 1e-12)


def weighted_softmax_ce_sum(
    logits: jnp.ndarray,  # (N, C)
    labels: jnp.ndarray,  # (N,)
    class_weight: Optional[jnp.ndarray] = None,  # (C,)
) -> jnp.ndarray:
    """Un-normalized class-weighted CE sum. The caller divides by a
    (possibly cross-device psum'd) avg_factor, so data-parallel loss values
    are exactly the single-device global-batch values."""
    ce = softmax_cross_entropy(logits, labels)
    if class_weight is not None:
        ce = ce * jnp.take(class_weight, labels)
    return ce.sum()


def ignore_index_ce_sum(
    logits: jnp.ndarray,  # (N, C)
    labels: jnp.ndarray,  # (N,)
    ignore_index: int = 0,
):
    """CE (sum, valid_count) over non-ignored labels; the caller normalizes
    (cross-device psum of both terms under data parallelism)."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    ce = softmax_cross_entropy(logits, safe_labels)
    ce = jnp.where(valid, ce, 0.0)
    return ce.sum(), valid.sum()


def ignore_index_ce_loss(
    logits: jnp.ndarray,  # (N, C)
    labels: jnp.ndarray,  # (N,)
    ignore_index: int = 0,
) -> jnp.ndarray:
    """CE averaged over non-ignored labels (caption generation loss;
    reference config ignore_index=0 = BERT [PAD])."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    ce = softmax_cross_entropy(logits, safe_labels)
    ce = jnp.where(valid, ce, 0.0)
    return ce.sum() / jnp.maximum(valid.sum(), 1)


def binary_ce_with_logits(
    logits: jnp.ndarray, targets: jnp.ndarray
) -> jnp.ndarray:
    """Elementwise numerically-stable BCE-with-logits, no reduction."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
