"""Bilinear point sampling on feature maps (MXU tent-matrix formulation).

TPU-native equivalent of mmcv's ``point_sample`` / ``F.grid_sample`` with
``align_corners=False`` and zero padding (used by the reference for mask
cost/loss point sampling, open_set/models/mask2former_head.py:357-366 and
:609-613).

Convention: points are (x, y) in [0, 1] normalized image coordinates.
Pixel-space position is ``p * size - 0.5`` (half-pixel centers), bilinear
weights of out-of-range corners are zeroed (grid_sample zero padding).

Why matmuls: XLA lowers per-element gathers on TPU essentially scalar —
a single (400, 12544)-point sampling of stride-4 mask logits traced at
181 ms, and the training step runs dozens of them (15.9 s/step, round-3
trace). Zero-padding bilinear weights are exactly a TENT over pixel
indices (``max(0, 1 - |p - i|)``, out-of-range corners get weight 0
automatically), so sampling factorizes into a row-interp matmul and a
column-interp contraction that both ride the MXU, and the backward is
also matmuls (the gather path's backward emitted equally-slow scatters).
Points are processed in chunks to bound the (N, chunk, W) intermediate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CHUNK = 2048


def _tent(coords_pix: jnp.ndarray, size: int, dtype) -> jnp.ndarray:
    """(..., P) float pixel coords -> (..., P, size) tent weights."""
    idx = jnp.arange(size, dtype=jnp.float32)
    t = jnp.maximum(
        0.0, 1.0 - jnp.abs(coords_pix[..., None].astype(jnp.float32) - idx)
    )
    return t.astype(dtype)


def _gather_bilinear(img: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Reference gather path: sample one 2-D map at float pixel coords.
    img (H, W), px/py (...). Kept for cross-checking the matmul path
    (tests/test_ops.py); not used on the training hot path."""
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
    """Sample ``img`` (H, W) at ``points_xy`` (..., 2) normalized [0,1]
    coords (gather path; small/irregular one-off sampling)."""
    h, w = img.shape
    px = points_xy[..., 0] * w - 0.5
    py = points_xy[..., 1] * h - 0.5
    return _gather_bilinear(img, px, py)


def _sample_shared(masks: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """masks (N, H, W), pts (P, 2) shared across N -> (N, P)."""
    n, h, w = masks.shape
    dt = masks.dtype
    px = pts[:, 0] * w - 0.5
    py = pts[:, 1] * h - 0.5
    ty = _tent(py, h, dt)  # (P, H)
    tx = _tent(px, w, dt)  # (P, W)
    a = jnp.einsum(
        "py,nyx->npx", ty, masks, preferred_element_type=jnp.float32
    )
    out = jnp.einsum(
        "npx,px->np", a.astype(dt), tx, preferred_element_type=jnp.float32
    )
    return out.astype(dt)


def _sample_per_map(masks: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """masks (N, H, W), pts (N, P, 2) -> (N, P)."""
    n, h, w = masks.shape
    dt = masks.dtype
    px = pts[..., 0] * w - 0.5
    py = pts[..., 1] * h - 0.5
    ty = _tent(py, h, dt)  # (N, P, H)
    tx = _tent(px, w, dt)  # (N, P, W)
    a = jnp.einsum(
        "npy,nyx->npx", ty, masks, preferred_element_type=jnp.float32
    )
    out = jnp.einsum(
        "npx,npx->np", a.astype(dt), tx, preferred_element_type=jnp.float32
    )
    return out.astype(dt)


def _chunked(fn, masks, points_xy, p_axis: int):
    p = points_xy.shape[p_axis]
    if p <= _CHUNK:
        return fn(masks, points_xy)
    pad = (-p) % _CHUNK
    if pad:
        widths = [(0, 0)] * points_xy.ndim
        widths[p_axis] = (0, pad)
        points_xy = jnp.pad(points_xy, widths)
    k = points_xy.shape[p_axis] // _CHUNK
    split = jnp.moveaxis(
        points_xy.reshape(
            points_xy.shape[:p_axis]
            + (k, _CHUNK)
            + points_xy.shape[p_axis + 1 :]
        ),
        p_axis,
        0,
    )  # (k, ..., CHUNK, ..., 2)
    # remat the chunk body: without it the lax.map (scan) VJP stacks the
    # per-chunk (N, CHUNK, W) einsum residuals across ALL chunks — two
    # bf16[k, N, CHUNK, W] buffers (2 x 5.47 GB at the batch-8 flagship
    # training shape) that OOM the step. Points carry no gradient (coords
    # come from stop_gradient'd logits), so the backward only recomputes
    # the cheap tent weights per chunk; d_masks is the same matmuls it
    # would run anyway.
    ckpt_fn = jax.checkpoint(fn)
    out = jax.lax.map(lambda pts: ckpt_fn(masks, pts), split)  # (k, N, CHUNK)
    out = jnp.moveaxis(out, 0, 1).reshape(masks.shape[0], k * _CHUNK)
    return out[:, :p]


def point_sample(masks: jnp.ndarray, points_xy: jnp.ndarray) -> jnp.ndarray:
    """Sample a stack of maps at points (MXU tent-matmul path).

    Args:
        masks: (N, H, W) float maps.
        points_xy: (P, 2) or (N, P, 2) normalized (x, y) in [0, 1].

    Returns:
        (N, P) sampled values.
    """
    if points_xy.ndim == 2:
        return _chunked(_sample_shared, masks, points_xy, 0)
    return _chunked(_sample_per_map, masks, points_xy, 1)
