"""Multi-scale deformable attention sampling core (XLA implementation).

TPU-native replacement for mmcv's CUDA ``ms_deform_attn_forward/backward``
kernel (the core of the reference's pixel decoder; configured at
/root/reference/configs/instance/coco_b48n17.py:48-58). Semantics match
``F.grid_sample(align_corners=False, padding_mode='zeros')`` per level,
weighted by softmaxed attention weights over (levels x points).

This module holds the exact XLA composition built from four corner
gathers per sampling point. XLA gathers are slow on TPU, so this path is
used for training (differentiable) and checkpoint-parity cross-checks;
the fast inference path is the gather-free windowed formulation
(:mod:`..ops.deform_attn_windowed_pallas`). Sampling locations are
normalized (x, y) in [0, 1] per level.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _sample_level(
    value_l: jnp.ndarray,  # (BH, h*w, D)
    locs: jnp.ndarray,  # (BH, Q, P, 2) normalized (x, y)
    h: int,
    w: int,
) -> jnp.ndarray:
    """Bilinear-sample one level at P points per query. Returns (BH, Q, P, D)."""
    bh, q, p, _ = locs.shape
    d = value_l.shape[-1]
    px = locs[..., 0] * w - 0.5
    py = locs[..., 1] * h - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    dx = (px - x0).astype(value_l.dtype)
    dy = (py - y0).astype(value_l.dtype)

    def corner(xi, yi, wgt):
        inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = (yc * w + xc).reshape(bh, q * p)
        g = jnp.take_along_axis(value_l, idx[:, :, None], axis=1)
        g = g.reshape(bh, q, p, d)
        return g * (wgt * inside.astype(value_l.dtype))[..., None]

    return (
        corner(x0, y0, (1 - dx) * (1 - dy))
        + corner(x0 + 1, y0, dx * (1 - dy))
        + corner(x0, y0 + 1, (1 - dx) * dy)
        + corner(x0 + 1, y0 + 1, dx * dy)
    )


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-scale deformable attention aggregation.

    Args:
        value: (B, S, H, D) flattened multi-level values, S = sum(h*w).
        spatial_shapes: static list of per-level (h, w).
        sampling_locations: (B, Q, H, L, P, 2) normalized (x, y) in [0, 1].
        attention_weights: (B, Q, H, L, P), already softmaxed over L*P.

    Returns:
        (B, Q, H*D) aggregated features.
    """
    b, s, nh, d = value.shape
    _, q, _, nl, np_, _ = sampling_locations.shape
    assert nl == len(spatial_shapes)

    # split levels along the token axis (static offsets)
    offsets = [0]
    for (h, w) in spatial_shapes:
        offsets.append(offsets[-1] + h * w)
    assert offsets[-1] == s

    # (B, S, H, D) -> (B*H, S, D)
    value_bh = jnp.transpose(value, (0, 2, 1, 3)).reshape(b * nh, s, d)
    locs_bh = jnp.transpose(sampling_locations, (0, 2, 1, 3, 4, 5)).reshape(
        b * nh, q, nl, np_, 2
    )
    wgts_bh = jnp.transpose(attention_weights, (0, 2, 1, 3, 4)).reshape(
        b * nh, q, nl, np_
    )

    out = jnp.zeros((b * nh, q, d), dtype=value.dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = value_bh[:, offsets[lvl] : offsets[lvl + 1], :]
        sampled = _sample_level(value_l, locs_bh[:, :, lvl], h, w)  # (BH,Q,P,D)
        out = out + jnp.einsum(
            "bqp,bqpd->bqd", wgts_bh[:, :, lvl].astype(value.dtype), sampled
        )

    # (B*H, Q, D) -> (B, Q, H*D)
    out = out.reshape(b, nh, q, d)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, q, nh * d)
