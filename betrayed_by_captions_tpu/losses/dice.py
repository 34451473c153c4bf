"""Dice loss (naive variant) on sampled mask points.

TPU-native equivalent of mmdet ``DiceLoss`` as configured by the reference
(configs/instance/coco_b48n17.py:135-142: use_sigmoid/activate=True,
naive_dice=True, eps=1.0): per mask,
``1 - (2*sum(p*t) + eps) / (sum(p) + sum(t) + eps)`` with p = sigmoid(pred).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def naive_dice_loss(
    pred_logits: jnp.ndarray,  # (N, P)
    targets: jnp.ndarray,  # (N, P) in {0,1}
    eps: float = 1.0,
) -> jnp.ndarray:
    """Per-mask naive dice loss, no reduction. Returns (N,)."""
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    num = 2.0 * (p * t).sum(axis=-1)
    den = p.sum(axis=-1) + t.sum(axis=-1)
    return 1.0 - (num + eps) / (den + eps)
