"""Mask utilities (pure JAX, static shapes).

``mask2bbox`` is the TPU-native equivalent of mmdet's mask2bbox used by the
fusion head (open_set/models/maskformer_fusion_head.py:360-363): tight xyxy
boxes around binary masks; empty masks yield a degenerate (0,0,0,0) box.
"""

from __future__ import annotations

import jax.numpy as jnp


def mask2bbox(masks: jnp.ndarray) -> jnp.ndarray:
    """Compute tight bounding boxes.

    Args:
        masks: (N, H, W) boolean or {0,1} masks.

    Returns:
        (N, 4) float32 boxes in (x1, y1, x2, y2); zeros for empty masks.
    """
    n, h, w = masks.shape
    m = masks.astype(jnp.bool_)
    any_row = jnp.any(m, axis=2)  # (N, H)
    any_col = jnp.any(m, axis=1)  # (N, W)
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    big = jnp.float32(1e9)
    y1 = jnp.min(jnp.where(any_row, rows[None, :], big), axis=1)
    y2 = jnp.max(jnp.where(any_row, rows[None, :], -big), axis=1) + 1
    x1 = jnp.min(jnp.where(any_col, cols[None, :], big), axis=1)
    x2 = jnp.max(jnp.where(any_col, cols[None, :], -big), axis=1) + 1
    nonempty = jnp.any(any_row, axis=1)
    boxes = jnp.stack([x1, y1, x2, y2], axis=1)
    return jnp.where(nonempty[:, None], boxes, jnp.zeros_like(boxes))
