"""Bilinear resize matching torch ``F.interpolate(align_corners=False)``.

Used for attention-mask pyramid resizing (reference
open_set/models/mask2former_head.py:749-753), mask upsampling at test time
(:960-964) and rescaling to original resolution
(open_set/models/maskformer_fusion_head.py:407-414).

TPU-native design: bilinear resize is separable, so we express it as two
dense 1-D interpolation matmuls (out = R_h @ x @ R_w^T). Interpolation
matrices are trace-time numpy constants (static shapes), and the matmuls
ride the MXU instead of emitting millions of scalar gathers. Semantics
match torch's non-antialiased half-pixel-center bilinear exactly
(source coord = max(0, (i + 0.5) * in/out - 0.5), right edge clamped).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=128)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) row-stochastic linear interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    scale = in_size / out_size
    for i in range(out_size):
        src = max(0.0, (i + 0.5) * scale - 0.5)
        i0 = int(np.floor(src))
        i0 = min(i0, in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        frac = src - i0
        m[i, i0] += 1.0 - frac
        m[i, i1] += frac
    return m


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize the last two dims of ``x`` to (out_h, out_w), bilinear."""
    *lead, h, w = x.shape
    if (h, w) == (out_h, out_w):
        return x
    rh = jnp.asarray(_interp_matrix(h, out_h))  # (out_h, h)
    rw = jnp.asarray(_interp_matrix(w, out_w))  # (out_w, w)
    flat = x.reshape((-1, h, w))
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    flat = flat.astype(dtype)
    out = jnp.einsum(
        "oh,nhw,pw->nop",
        rh.astype(dtype),
        flat,
        rw.astype(dtype),
        optimize=True,
    )
    return out.reshape(tuple(lead) + (out_h, out_w))
