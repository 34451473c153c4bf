"""Fused Pallas TPU kernel for windowed multi-scale deformable attention.

Same math as :func:`..ops.deform_attn_windowed.windowed_ms_deform_attn`
(the gather-free reformulation of mmcv's CUDA ``ms_deform_attn``; see that
module's docstring for the derivation and semantics), executed as one
fused VPU kernel per (query-level, value-level) pair:

- the value level is laid out as a padded row-major image
  ``(B, H, rows, D, lanes)`` in VMEM; a window cell (r, c) is a pure
  static slice of it — row shift via the leading (untiled) dim, column
  shift via a static lane-offset slice. No gathers, no rolls.
- cross-level alignment (query level a sampling value level b) is
  precomputed OUTSIDE the kernel with dense XLA ops: ``jnp.repeat``
  up-sampling when the value level is coarser, k-phase decimation when it
  is finer — so in-kernel cell slabs stay static slices.
- per-cell weights are dense tent products summed over the P sampling
  points; multiplies run in bf16 (the value is cast to bf16 by design),
  accumulation is f32 per row-shift.

Measured on TPU v5e at the flagship encoder shape (B=4, S=22050, 8 heads,
levels (25,42)/(50,84)/(100,168)): ~47 ms per layer (9 pair calls), vs
~336 ms for the exact XLA gather composition and ~16.5 s for the XLA
windowed composition (gathers and unfused shifted slabs respectively);
in-graph with fused prep it profiles at ~25 ms/layer (6.3 ms/img).

Forward-only: gradients are not defined through ``pallas_call``; training
uses the exact gather composition (ops/deform_attn.py). The module-level
offset clamp (models/deformable.py) keeps both paths numerically
identical, so train (exact) and eval (this kernel) agree.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deform_attn_windowed import _anchor

DEFAULT_WINDOW = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pair_kernel(
    v_ref,  # (1, 1, ROWS, D, VLANES)  value prep, bf16
    fx_ref,  # (1, 1, HA, P, WPAD)  f32
    fy_ref,  # (1, 1, HA, P, WPAD)  f32
    at_ref,  # (1, 1, HA, P, WPAD)  bf16
    o_ref,  # (1, 1, HA, D, WPAD)  bf16
    *,
    window: int,
    rb: int,
    ha: int,
    d: int,
    wpad: int,
    mode: str,  # 'same' | 'coarser' | 'finer'
    k: int,  # level ratio (1 for same)
    phase_rows: int,  # rows per phase copy ('finer' mode)
):
    w = window

    def row_block(ib, _):
        i = ib * rb
        fx = fx_ref[0, 0, pl.ds(i, rb)]  # (rb, P, WPAD) f32
        fy = fy_ref[0, 0, pl.ds(i, rb)]
        at = at_ref[0, 0, pl.ds(i, rb)].astype(jnp.float32)
        acc = jnp.zeros((rb, d, wpad), jnp.float32)
        for r in range(w):
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(fy - r))
            wy = at * ty  # (rb, P, WPAD)
            racc = jnp.zeros((rb, d, wpad), jnp.bfloat16)
            for c in range(w):
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - c))
                cw = jnp.sum(wy * tx, axis=1, keepdims=True).astype(
                    jnp.bfloat16
                )  # (rb, 1, WPAD)
                if mode == "same":
                    row0 = i + r + 1
                    col0 = c + 1
                elif mode == "coarser":
                    row0 = i + k * (r + 1) - k // 2
                    col0 = k * (c + 1) - k // 2
                else:  # finer: pick phase copy, then slice
                    mr = (k - 1) // 2 + r + 1
                    mc = (k - 1) // 2 + c + 1
                    phase = (mr % k) * k + (mc % k)
                    row0 = phase * phase_rows + i + mr // k
                    col0 = mc // k
                slab = v_ref[0, 0, pl.ds(row0, rb), :, col0 : col0 + wpad]
                racc = racc + cw * slab
            acc = acc + racc.astype(jnp.float32)
        o_ref[0, 0, pl.ds(i, rb)] = acc.astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, ha // rb, row_block, 0)


def _prep_value_pair(
    vimg: jnp.ndarray,  # (B, H, Hb, D, Wb) bf16 value image
    ha: int,
    wa: int,
    hb: int,
    wb: int,
    window: int,
    wpad: int,
    rb: int,
    ha_pad: int,
):
    """Align the value image to the query grid so that every window-cell
    slab inside the kernel is a static slice. Returns (prep, mode, k,
    phase_rows). All ops are dense (pad / repeat / strided slice)."""
    w = window
    pad = w // 2
    b, h, _, d, _ = vimg.shape

    if ha == hb and wa == wb:
        # rows [i+1, i+w] cols [c+1, c+1+wpad]; row indices reach
        # (ha_pad-1) + w, columns reach w + wpad
        rows = ha_pad + w + 1
        cols = wpad + w + 1
        prep = jnp.zeros((b, h, rows, d, cols), vimg.dtype)
        prep = jax.lax.dynamic_update_slice(
            prep, vimg, (0, 0, pad, 0, pad)
        )
        return prep, "same", 1, 0

    if hb < ha:  # value coarser by k: upsample with repeat
        k = ha // hb
        assert k * hb == ha and k * wb == wa, (ha, wa, hb, wb)
        # row indices reach (ha_pad-1) + k*w - k//2; cols k*(w+1) - k//2 + wpad
        rows_v = hb + 2 * pad
        cols_v = wb + 2 * pad
        vp = jnp.zeros((b, h, rows_v, d, cols_v), vimg.dtype)
        vp = jax.lax.dynamic_update_slice(vp, vimg, (0, 0, pad, 0, pad))
        up = jnp.repeat(jnp.repeat(vp, k, axis=2), k, axis=4)
        rows = max(k * rows_v, ha_pad + k * w + 1)
        cols = max(k * cols_v, wpad + k * (w + 1) + 1)
        prep = jnp.zeros((b, h, rows, d, cols), vimg.dtype)
        prep = jax.lax.dynamic_update_slice(prep, up, (0, 0, 0, 0, 0))
        return prep, "coarser", k, 0

    # value finer by k: k x k phase decimation
    k = hb // ha
    assert k * ha == hb and k * wa == wb, (ha, wa, hb, wb)
    rows_v = hb + 2 * pad
    cols_v = wb + 2 * pad
    vp = jnp.zeros((b, h, rows_v, d, cols_v), vimg.dtype)
    vp = jax.lax.dynamic_update_slice(vp, vimg, (0, 0, pad, 0, pad))
    # phase (pr, pc): vp[pr::k, :, pc::k]; in-kernel row index reaches
    # i + (m // k) <= (ha_pad - 1) + ((k-1)//2 + w) // k + 1
    m_max = (k - 1) // 2 + w
    phase_rows = ha_pad + m_max // k + 1
    phase_cols = wpad + m_max // k + 1
    phases = []
    for pr in range(k):
        for pc in range(k):
            ph = vp[:, :, pr::k, :, pc::k]
            ph = jax.lax.dynamic_update_slice(
                jnp.zeros((b, h, phase_rows, d, phase_cols), vimg.dtype),
                ph[:, :, :phase_rows, :, :phase_cols],
                (0, 0, 0, 0, 0),
            )
            phases.append(ph)
    prep = jnp.concatenate(phases, axis=2)  # (B,H,k*k*phase_rows,D,cols)
    return prep, "finer", k, phase_rows


def windowed_ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    window: int = DEFAULT_WINDOW,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused windowed deformable self-attention. Returns (B, S, H*D).

    Matches ``windowed_ms_deform_attn`` (and, whenever offsets stay inside
    the window — guaranteed by the module-level clamp — the exact gather
    op) to bf16 tolerance: values are multiplied in bf16, accumulated f32.
    """
    b, s, nh, d = value.shape
    assert sampling_locations.shape[1] == s, "self-attention required"
    # Mosaic only lowers on real TPU; CPU (tests, driver dryruns) runs the
    # kernel in interpreter mode automatically
    interpret = interpret or jax.default_backend() == "cpu"
    nl = len(spatial_shapes)
    p = sampling_locations.shape[4]
    w = window
    out_dtype = value.dtype

    offsets = [0]
    for (h_l, w_l) in spatial_shapes:
        offsets.append(offsets[-1] + h_l * w_l)
    assert offsets[-1] == s

    # value images per level: (B, H, Hb, D, Wb), bf16 compute
    vimgs = []
    for li, (h_l, w_l) in enumerate(spatial_shapes):
        v = value[:, offsets[li] : offsets[li + 1]].reshape(
            b, h_l, w_l, nh, d
        )
        vimgs.append(
            jnp.transpose(v, (0, 3, 1, 4, 2)).astype(jnp.bfloat16)
        )  # (B, H, Hb, D, Wb)

    out_levels: List[jnp.ndarray] = []
    for ai, (ha, wa) in enumerate(spatial_shapes):
        # row-block size MUST be a power of two: odd sizes (e.g. 5) hit a
        # ~1000x Mosaic retiling cliff (measured 11s vs 10ms per call)
        rb = 4
        ha_pad = _round_up(ha, rb)
        wpad = _round_up(wa, 128)

        locs_a = sampling_locations[:, offsets[ai] : offsets[ai + 1]]
        wgts_a = attention_weights[:, offsets[ai] : offsets[ai + 1]]
        # (B, H, Ha, Wa, P, ...) layouts
        locs_a = jnp.transpose(
            locs_a.reshape(b, ha, wa, nh, nl, p, 2), (0, 3, 1, 2, 4, 5, 6)
        )  # (B, H, Ha, Wa, L, P, 2)
        wgts_a = jnp.transpose(
            wgts_a.reshape(b, ha, wa, nh, nl, p), (0, 3, 1, 2, 4, 5)
        )  # (B, H, Ha, Wa, L, P)

        acc = None
        for bi, (hb, wb) in enumerate(spatial_shapes):
            px = locs_a[..., bi, :, 0].astype(jnp.float32) * wb - 0.5
            py = locs_a[..., bi, :, 1].astype(jnp.float32) * hb - 0.5
            ax = jnp.asarray(_anchor(wa, wb, w), jnp.float32)
            ay = jnp.asarray(_anchor(ha, hb, w), jnp.float32)
            fx = jnp.clip(px - ax[None, None, None, :, None], 0, w - 1)
            fy = jnp.clip(py - ay[None, None, :, None, None], 0, w - 1)
            at = wgts_a[..., bi, :]

            # to kernel layout (B, H, Ha_pad, P, WPAD); padded region gets
            # attn=0 so it contributes nothing
            def to_lanes(x, fill):
                x = jnp.transpose(x, (0, 1, 2, 4, 3))  # (B,H,Ha,P,Wa)
                return jnp.pad(
                    x,
                    (
                        (0, 0),
                        (0, 0),
                        (0, ha_pad - ha),
                        (0, 0),
                        (0, wpad - wa),
                    ),
                    constant_values=fill,
                )

            fx_k = to_lanes(fx, 0.0)
            fy_k = to_lanes(fy, 0.0)
            at_k = to_lanes(at, 0.0).astype(jnp.bfloat16)

            prep, mode, k, phase_rows = _prep_value_pair(
                vimgs[bi], ha, wa, hb, wb, w, wpad, rb, ha_pad
            )
            rows_v, cols_v = prep.shape[2], prep.shape[4]

            kernel = functools.partial(
                _pair_kernel,
                window=w,
                rb=rb,
                ha=ha_pad,
                d=d,
                wpad=wpad,
                mode=mode,
                k=k,
                phase_rows=phase_rows,
            )
            part = pl.pallas_call(
                kernel,
                grid=(b, nh),
                in_specs=[
                    pl.BlockSpec(
                        (1, 1, rows_v, d, cols_v),
                        lambda bb, hh: (bb, hh, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 1, ha_pad, p, wpad),
                        lambda bb, hh: (bb, hh, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 1, ha_pad, p, wpad),
                        lambda bb, hh: (bb, hh, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 1, ha_pad, p, wpad),
                        lambda bb, hh: (bb, hh, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, ha_pad, d, wpad),
                    lambda bb, hh: (bb, hh, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (b, nh, ha_pad, d, wpad), jnp.bfloat16
                ),
                interpret=interpret,
            )(prep, fx_k, fy_k, at_k)
            acc = part.astype(jnp.float32) if acc is None else acc + part

        # (B, H, Ha_pad, D, WPAD) -> (B, Ha*Wa, H*D)
        out = acc[:, :, :ha, :, :wa]
        out = jnp.transpose(out, (0, 2, 4, 1, 3)).reshape(
            b, ha * wa, nh * d
        )
        out_levels.append(out)

    return jnp.concatenate(out_levels, axis=1).astype(out_dtype)
