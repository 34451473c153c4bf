"""Windowed multi-scale deformable attention — gather-free TPU formulation.

TPU-native re-design of mmcv's CUDA ``ms_deform_attn`` kernel (reference
configs/instance/coco_b48n17.py:48-58). The CUDA kernel bilinear-samples
P=4 arbitrary points per (query, head, level) — a scattered gather, which
is catastrophically slow on TPU (XLA's gather runs ~30us per 128 rows on
v5e, and Mosaic's dynamic-gather primitive only supports same-shape
permutes). This module removes the gather entirely:

Each sampling point is expressed over a static WxW cell window anchored at
the query's reference cell in the target level. Bilinear interpolation of
a point at fractional position (fx, fy) inside the window is exactly a
separable tent product over the window cells::

    sample(q, p) = sum_{r, c in W x W} tent(fy_p - r) * tent(fx_p - c)
                   * V[base_y(q) + r, base_x(q) + c]

so the attention output becomes a sum of W^2 *statically shifted* images
weighted by dense per-cell weights — shifts, multiplies and adds only,
no data-dependent indexing (the restructuring family used by NPU
deformable-attention implementations; see PAPERS.md "Towards Efficient
Multi-Scale Deformable Attention on NPU"):

    out(q) = sum_{r,c} [ sum_p attn_p * tent(fy_p - r) * tent(fx_p - c) ]
             * V[base_y + r, base_x + c]

Semantics vs the exact gather op (ops/deform_attn.py):
- identical (to fp tolerance) whenever every sampling offset stays within
  the window: offsets in (-W/2 + 1, W/2 - 1) cells of the target level
  relative to the query's reference point (the mmcv compass init reaches
  4 cells, so the default window of 12 covers it with margin for growth
  during training);
- points outside the window are CLAMPED to the window edge (the exact op
  samples them wherever they land). Train and eval use the same clamp, so
  the model is self-consistent; use the exact op for cross-checking ported
  reference checkpoints whose offsets exceed the window.

Queries must be the concatenated level token grids themselves (true for
the pixel-decoder's deformable *self*-attention, its only use — reference
mask2former_head.py:787): the window anchor of token (i, j) of level a in
target level b is the static grid map floor((j+0.5)*Wb/Wa - 0.5) - (W/2-1).
Cross-level anchors are realized with phase-decimated / repeated copies of
the value map (dense strided slices), never gathers.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

DEFAULT_WINDOW = 12


def _anchor(extent_q: int, extent_v: int, window: int) -> np.ndarray:
    """Static window anchor per query coordinate: floor of the reference
    position in value-level cells, shifted to the window start."""
    j = np.arange(extent_q, dtype=np.float64)
    ref = (j + 0.5) * (extent_v / extent_q) - 0.5
    return np.floor(ref).astype(np.int64) - (window // 2 - 1)


def _aligned_slabs(
    vp: jnp.ndarray, axis: int, extent_q: int, extent_v: int, window: int
) -> List[jnp.ndarray]:
    """Per window cell shift s in [0, W): a view of the padded value array
    aligned to the query grid along ``axis``: out_s[..., i, ...] =
    vp[..., anchor(i) + s + W//2, ...].

    ``vp`` is padded by W//2 on both sides of ``axis`` (length
    extent_v + W). Built purely from (strided) slicing and jnp.repeat —
    never gathers. Exact integer level ratios required.
    """
    pad = window // 2

    def take(arr, start, length, step=1):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(start, start + length * step, step)
        return arr[tuple(idx)]

    out = []
    if extent_q == extent_v:
        # anchor(i) = i - (W//2 - 1); vp index = i + s + 1
        for s in range(window):
            out.append(take(vp, s + 1, extent_q))
    elif extent_v % extent_q == 0:
        # value finer by k: anchor(i) = k*i + floor((k-1)/2) - (W//2 - 1)
        # vp index = k*i + m with m = floor((k-1)/2) + s + 1
        k = extent_v // extent_q
        for s in range(window):
            m = (k - 1) // 2 + s + 1
            out.append(take(vp, m, extent_q, step=k))
    elif extent_q % extent_v == 0:
        # value coarser by k: anchor(i) = (i - k//2) // k - (W//2 - 1)
        # vp index = (i - k//2 + k*(s+1)) // k  ->  slice of repeat(vp, k)
        k = extent_q // extent_v
        upsampled = jnp.repeat(vp, k, axis=axis)  # U[m] = vp[m // k]
        for s in range(window):
            start = k * (s + 1) - k // 2
            out.append(take(upsampled, start, extent_q))
    else:
        raise ValueError(
            f"windowed deformable attention requires integer level ratios, "
            f"got query extent {extent_q} vs value extent {extent_v}"
        )
    return out


def windowed_ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    window: int = DEFAULT_WINDOW,
) -> jnp.ndarray:
    """Gather-free multi-scale deformable self-attention.

    Args:
        value: (B, S, H, D) flattened multi-level values, S = sum(h*w).
        spatial_shapes: static per-level (h, w); queries are these grids.
        sampling_locations: (B, S, H, L, P, 2) normalized (x, y).
        attention_weights: (B, S, H, L, P), softmaxed over L*P.
        window: cells per side of the sampling window.

    Returns:
        (B, S, H*D), matching ops.deform_attn.ms_deform_attn whenever all
        offsets stay inside the window.
    """
    b, s, nh, d = value.shape
    sq = sampling_locations.shape[1]
    assert sq == s, "windowed deformable attention requires self-attention"
    nl = len(spatial_shapes)
    p = sampling_locations.shape[4]
    pad = window // 2
    compute_dtype = jnp.promote_types(value.dtype, jnp.float32)

    offsets = [0]
    for (h, w) in spatial_shapes:
        offsets.append(offsets[-1] + h * w)
    assert offsets[-1] == s

    # per value-level zero-padded image (B, Hb+W, Wb+W, H, D) — the zero
    # margin reproduces the exact op's out-of-image corner zeroing
    vimgs = []
    for li, (h, w) in enumerate(spatial_shapes):
        v = value[:, offsets[li] : offsets[li + 1]].reshape(b, h, w, nh, d)
        vimgs.append(
            jnp.pad(v, ((0, 0), (pad, pad), (pad, pad), (0, 0), (0, 0)))
        )

    out_levels = []
    for ai, (ha, wa) in enumerate(spatial_shapes):
        locs_a = sampling_locations[:, offsets[ai] : offsets[ai + 1]]
        wgts_a = attention_weights[:, offsets[ai] : offsets[ai + 1]]
        locs_a = locs_a.reshape(b, ha, wa, nh, nl, p, 2)
        wgts_a = wgts_a.reshape(b, ha, wa, nh, nl, p).astype(compute_dtype)

        acc = jnp.zeros((b, ha, wa, nh, d), compute_dtype)
        for bi, (hb, wb) in enumerate(spatial_shapes):
            # fractional window coords, clamped into the window
            px = locs_a[..., bi, :, 0].astype(jnp.float32) * wb - 0.5
            py = locs_a[..., bi, :, 1].astype(jnp.float32) * hb - 0.5
            ax = jnp.asarray(_anchor(wa, wb, window), px.dtype)
            ay = jnp.asarray(_anchor(ha, hb, window), py.dtype)
            fx = jnp.clip(px - ax[None, None, :, None, None], 0, window - 1)
            fy = jnp.clip(py - ay[None, :, None, None, None], 0, window - 1)
            fx = fx.astype(compute_dtype)
            fy = fy.astype(compute_dtype)
            attn = wgts_a[..., bi, :]  # (B, Ha, Wa, H, P)

            row_slabs = _aligned_slabs(vimgs[bi], 1, ha, hb, window)
            for r in range(window):
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(fy - r))  # (B,Ha,Wa,H,P)
                wy = attn * ty
                col_slabs = _aligned_slabs(row_slabs[r], 2, wa, wb, window)
                for c in range(window):
                    tx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - c))
                    cw = (wy * tx).sum(-1)  # (B, Ha, Wa, H)
                    acc = acc + cw[..., None] * col_slabs[c].astype(
                        compute_dtype
                    )
        out_levels.append(acc.reshape(b, ha * wa, nh, d))

    out = jnp.concatenate(out_levels, axis=1)  # (B, S, H, D)
    return out.reshape(b, s, nh * d).astype(value.dtype)
