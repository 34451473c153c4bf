"""Multi-scale deformable self-attention module (flax).

TPU-native equivalent of mmcv's ``MultiScaleDeformableAttention``
(configured at /root/reference/configs/instance/coco_b48n17.py:48-58:
embed 256, 8 heads, 3 levels, 4 points). The sampling core is selected by
``attn_impl``:

- ``"exact"`` — the XLA gather composition (:func:`..ops.ms_deform_attn`).
  Reference CUDA semantics bit-for-fp-bit; differentiable; slow on TPU
  (gathers). Used for checkpoint-parity cross-checks.
- ``"windowed"`` — the gather-free dense window composition
  (:mod:`..ops.deform_attn_windowed`), pure XLA. Test/reference impl.
- ``"windowed_pallas"`` — the fused Pallas TPU kernel
  (:mod:`..ops.deform_attn_windowed_pallas`), differentiable via custom
  VJP (two backward kernels; see that module). This is the production
  path for BOTH training and inference on TPU (~7x faster forward,
  ~25x faster fwd+bwd than "exact" on v5e).

Windowing semantic (``window``):

- ``window=<int>`` (TPU-first default, 8): sampling offsets are CLAMPED
  to ``window/2 - 1`` cells of each target level, making every impl
  numerically identical (windowed sampling never leaves its window) and
  train/eval consistent. The mmcv compass init ladder (radii 1..4 cells)
  is rescaled so the outermost point starts at the clamp boundary
  (radii 0.75/1.5/2.25/3 at window 8) instead of collapsing multiple
  points onto it.
- ``window=None`` (reference-faithful): NO clamp, compass init radii
  1..4 exactly as mmcv MultiScaleDeformableAttention (which never clamps
  — learned offsets routinely exceed 2 cells). Requires
  ``attn_impl="exact"``; this is the mode checkpoint-parity checks and
  reference-checkpoint evaluation must use (engine/porting.py).

Initialization otherwise mirrors the reference semantics (sampling
offsets start as a scaled 8-direction compass grid, attention weights
start at zero) since training parity depends on it.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.deform_attn import ms_deform_attn

Dtype = Any


def window_per_level(
    window, num_levels: int
) -> "tuple[float | None, ...]":
    """Normalize the ``window`` config (int, per-level tuple, or None)
    to one window per sampling level.  A per-level tuple (e.g.
    ``(8, 6, 4)`` for value strides (8, 16, 32)) keeps the clamp reach
    roughly constant in PIXELS — (W/2-1) cells x value stride — at far
    fewer dense cells than a uniform largest window (116 vs 192 at
    W=(8,6,4); NEXT r3 item 3)."""
    if window is None or isinstance(window, (int, float)):
        return (window,) * num_levels
    ws = tuple(window)
    if len(ws) != num_levels:
        raise ValueError(
            f"per-level window {ws} must have {num_levels} entries"
        )
    return ws


def _compass_offset_init(
    num_heads: int,
    num_levels: int,
    num_points: int,
    max_offset=None,
):
    """Bias init for sampling offsets: unit compass directions per head,
    scaled by (point index + 1). With a ``max_offset`` below num_points
    (tight sampling windows), the ladder is rescaled so the outermost
    point starts at the clamp boundary instead of collapsing onto it.
    ``max_offset`` may be per-level (sequence of length num_levels)."""
    thetas = np.arange(num_heads, dtype=np.float64) * (2 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # (H, 2)
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    scale = np.arange(1, num_points + 1, dtype=np.float64)[None, None, :, None]
    scale = np.tile(scale, (1, num_levels, 1, 1))
    if max_offset is not None:
        for li, mo in enumerate(window_per_level(max_offset, num_levels)):
            if mo is not None and mo < num_points:
                scale[:, li] *= mo / num_points
    grid = grid * scale
    flat = grid.reshape(-1).astype(np.float32)

    def init(key, shape, dtype=jnp.float32):
        assert shape == flat.shape, (shape, flat.shape)
        return jnp.asarray(flat, dtype)

    return init


def make_reference_points(spatial_shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    """Per-token normalized (x, y) grid centers, concatenated over levels.

    Returns (S, 2) float32 where S = sum(h*w); each token's point is reused
    across all sampling levels (mmdet MSDeformAttnPixelDecoder semantics
    with all-valid masks).
    """
    pts = []
    for (h, w) in spatial_shapes:
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    return np.concatenate(pts, axis=0)


class MSDeformAttention(nn.Module):
    """Deformable self-attention over concatenated multi-level pixel tokens."""

    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    attn_impl: str = "exact"  # exact | windowed | windowed_pallas
    # int, per-level tuple (e.g. (8, 6, 4): constant clamp reach in
    # PIXELS across value strides), or None = reference-faithful
    # unclamped (exact only)
    window: Any = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, S, C) tokens + positional encodings
        value: jnp.ndarray,  # (B, S, C) raw tokens
        reference_points: jnp.ndarray,  # (S, 2) normalized (x, y)
        spatial_shapes: Sequence[Tuple[int, int]],  # static per-level (h, w)
    ) -> jnp.ndarray:
        b, s, c = query.shape
        nh, nl, npts = self.num_heads, self.num_levels, self.num_points
        head_dim = self.embed_dim // nh

        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(b, s, nh, head_dim)

        if self.window is None and self.attn_impl != "exact":
            raise ValueError(
                "window=None (unclamped reference semantics) requires "
                f"attn_impl='exact'; got {self.attn_impl!r}"
            )
        wins = window_per_level(self.window, nl)
        max_offset = (
            None
            if self.window is None
            else tuple(w / 2 - 1 for w in wins)
        )
        offsets = nn.Dense(
            nh * nl * npts * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=_compass_offset_init(nh, nl, npts, max_offset=max_offset),
            name="sampling_offsets",
        )(query).reshape(b, s, nh, nl, npts, 2)

        attn = nn.Dense(
            nh * nl * npts,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(b, s, nh, nl * npts)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = attn.reshape(b, s, nh, nl, npts)

        # clamp offsets into each level's sampling window (see module
        # docstring); window=None keeps the reference's unclamped
        # semantics.  With a per-level window, clamped offsets never
        # leave level l's W_l window, so running the dense kernel at
        # max(W_l) is numerically identical to a true mixed-window
        # kernel (the outer cells carry zero tent weight).
        offsets = offsets.astype(jnp.float32)
        if self.window is not None:
            clamp = jnp.asarray(
                [w / 2 - 1 for w in wins], jnp.float32
            ).reshape(1, 1, 1, nl, 1, 1)
            offsets = jnp.clip(offsets, -clamp, clamp)

        # normalize offsets by each sampling level's (w, h)
        normalizer = jnp.asarray(
            [[w, h] for (h, w) in spatial_shapes], dtype=jnp.float32
        )  # (L, 2)
        locations = (
            reference_points[None, :, None, None, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )  # (B, S, H, L, P, 2)

        if self.attn_impl == "windowed_pallas":
            from ..ops.deform_attn_windowed_pallas import (
                windowed_ms_deform_attn_pallas,
            )

            out = windowed_ms_deform_attn_pallas(
                v, spatial_shapes, locations, attn,
                window=tuple(int(x) for x in wins),
            )
        elif self.attn_impl == "windowed":
            from ..ops.deform_attn_windowed import windowed_ms_deform_attn

            out = windowed_ms_deform_attn(
                v, spatial_shapes, locations, attn,
                window=int(max(wins)),
            )
        else:
            assert self.attn_impl == "exact", self.attn_impl
            out = ms_deform_attn(v, spatial_shapes, locations, attn)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="output_proj")(out)
