"""Bilinear point sampling on feature maps (pure XLA, gather-based).

TPU-native equivalent of mmcv's ``point_sample`` / ``F.grid_sample`` with
``align_corners=False`` and zero padding (used by the reference for mask
cost/loss point sampling, open_set/models/mask2former_head.py:357-366 and
:609-613).

Convention: points are (x, y) in [0, 1] normalized image coordinates.
Pixel-space position is ``p * size - 0.5`` (half-pixel centers), bilinear
weights of out-of-range corners are zeroed (grid_sample zero padding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_bilinear(img: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Sample one 2-D map at float pixel coords. img (H, W), px/py (...)."""
    h, w = img.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    dx = px - x0
    dy = py - y0

    flat = img.reshape(-1)

    def corner(xi, yi, weight):
        inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jnp.take(flat, yc * w + xc, axis=0)
        return vals * weight * inside.astype(img.dtype)

    out = (
        corner(x0, y0, (1 - dx) * (1 - dy))
        + corner(x0 + 1, y0, dx * (1 - dy))
        + corner(x0, y0 + 1, (1 - dx) * dy)
        + corner(x0 + 1, y0 + 1, dx * dy)
    )
    return out


def grid_sample_2d(img: jnp.ndarray, points_xy: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` (H, W) at ``points_xy`` (..., 2) normalized [0,1] coords."""
    h, w = img.shape
    px = points_xy[..., 0] * w - 0.5
    py = points_xy[..., 1] * h - 0.5
    return _gather_bilinear(img, px, py)


def point_sample(masks: jnp.ndarray, points_xy: jnp.ndarray) -> jnp.ndarray:
    """Sample a stack of maps at shared points.

    Args:
        masks: (N, H, W) float maps.
        points_xy: (P, 2) or (N, P, 2) normalized (x, y) in [0, 1].

    Returns:
        (N, P) sampled values.
    """
    if points_xy.ndim == 2:
        return jax.vmap(lambda m: grid_sample_2d(m, points_xy))(masks)
    return jax.vmap(grid_sample_2d)(masks, points_xy)
