"""Fused Pallas TPU kernel for windowed multi-scale deformable attention.

Same math as :func:`..ops.deform_attn_windowed.windowed_ms_deform_attn`
(the gather-free reformulation of mmcv's CUDA ``ms_deform_attn``; see that
module's docstring for the derivation and semantics), executed as one
fused VPU kernel per (query-level, value-level) pair:

- the value level is laid out as a padded row-major image
  ``(B, H, rows, D, lanes)`` in VMEM; a window cell (r, c) is a pure
  static slice of it — row shift via the leading (untiled) dim, column
  shift via a static lane-offset slice. No gathers, no rolls.
- cross-level alignment (query level a sampling value level b) — the
  merged (default) kernel builds ALL aligned value images on-chip from
  the raw per-level images, so XLA never materializes a padded /
  upsampled / phase-decomposed copy in HBM (those pads, broadcasts and
  the custom-call layout copies around them dominated the round-5
  encoder trace at ~2x the kernel time):
  - 'same_raw': the window-padded image is built in VMEM scratch — lanes
    shift via one MXU matmul against an iota-built 0/1 shift matrix
    (zero lane margins fall out of the matmul), row margins are explicit
    zero stores.
  - 'coarser_small': lanes expand k x via a 0/1 repeat matrix on the
    MXU; rows stay small and the cell loop repeats them with a static
    pattern (exact because the row-block size is a multiple of k).
  - 'finer_raw': k COLUMN-phase images are built via 0/1
    decimation+shift matrices; rows stay raw and the cell loop strides
    them by k with static single-row slices.
  The single-pair 'cell'/'packed' variants (and DEFORM_COMPACT=0) keep
  the classic XLA-materialized preps ('same'/'coarser'/'finer' modes).
- per-cell weights are dense tent products summed over the P sampling
  points; multiplies run in bf16 (the value is cast to bf16 by design),
  accumulation is f32 per row-shift.

Measured on TPU v5e at the flagship encoder shape (B=4, S=22050, 8 heads,
levels (25,42)/(50,84)/(100,168)): ~47 ms per layer (9 pair calls), vs
~336 ms for the exact XLA gather composition and ~16.5 s for the XLA
windowed composition (gathers and unfused shifted slabs respectively);
in-graph with fused prep it profiles at ~25 ms/layer (6.3 ms/img).

Differentiable: each pair call carries a custom VJP backed by two
backward kernels —

- a query-aligned kernel producing d_attn and the fractional-coordinate
  grads d_fx / d_fy (tent derivatives are +-1 indicators, so the grads
  are windowed sums of per-cell inner products s_rc = <g, slab>),
- a prep-aligned kernel producing d_value: the transpose of a static
  shift is a static shift, so d_prep is ANOTHER windowed pass reading
  (cw * g) at reversed row/column offsets — no scatter.

d_prep then flows through the (XLA-differentiable) repeat / phase /
padding prep back to d_value; d_fx / d_fy flow through the clamp and
level scaling back to sampling_locations. The exact gather composition
(ops/deform_attn.py) remains the cross-check path; the module-level
offset clamp (models/deformable.py) keeps both numerically identical.
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
    cellmap = {
        (r, c): (ph, ro, co)
        for (r, c, ph, ro, co) in _cell_table(mode, k, window)
    }

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
                phase, row_off, col0 = cellmap[(r, c)]
                row0 = phase * phase_rows + i + row_off
                if mode == "finer":
                    # narrow phase-copy read, zero-pad to wpad
                    narrow = v_ref.shape[-1] - col0
                    if narrow >= wpad:
                        slab = v_ref[
                            0, 0, pl.ds(row0, rb), :, col0 : col0 + wpad
                        ]
                    else:
                        slab = jnp.concatenate(
                            [
                                v_ref[0, 0, pl.ds(row0, rb), :, col0:],
                                jnp.zeros(
                                    (rb, d, wpad - narrow), jnp.bfloat16
                                ),
                            ],
                            axis=2,
                        )
                else:
                    slab = v_ref[0, 0, pl.ds(row0, rb), :, col0 : col0 + wpad]
                racc = racc + cw * slab
            acc = acc + racc.astype(jnp.float32)
        o_ref[0, 0, pl.ds(i, rb)] = acc.astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, ha // rb, row_block, 0)


def _pair_kernel_packed(
    v_ref,  # (1, HP, ROWS, D, VLANES)  value prep, bf16
    fx_ref,  # (1, 1, HA, HP*P, WPAD)  f32, heads packed into sublanes
    fy_ref,  # (1, 1, HA, HP*P, WPAD)  f32
    at_ref,  # (1, 1, HA, HP*P, WPAD)  bf16
    o_ref,  # (1, HP, HA, D, WPAD)  bf16
    *,
    window: int,
    rb: int,
    ha: int,
    d: int,
    p: int,
    wpad: int,
    mode: str,  # 'same' | 'coarser' | 'finer'
    k: int,
    phase_rows: int,
    hp: int,  # heads per grid step
):
    """Issue-efficiency variant of :func:`_pair_kernel`:

    - ``hp`` heads per grid step: their P-point weights share sublanes of
      one vreg set (P=4 alone half-fills the 8 sublanes), halving the
      per-head tent math and the grid/pipeline overhead;
    - column-outer loop ('same'/'coarser' modes): the lane-shifted load is
      a tall strided slab fetched once per column and re-sliced along the
      free leading dim for every row cell — w tall loads instead of w*w
      slab loads ('finer' mode keeps per-cell phase reads).
    """
    w = window
    cellmap = {
        (r, c): (ph, ro, co)
        for (r, c, ph, ro, co) in _cell_table(mode, k, window)
    }

    def row_block(ib, _):
        i = ib * rb
        fx = fx_ref[0, 0, pl.ds(i, rb)]  # (rb, HP*P, WPAD) f32
        fy = fy_ref[0, 0, pl.ds(i, rb)]
        at = at_ref[0, 0, pl.ds(i, rb)].astype(jnp.float32)
        wys = []
        for r in range(w):
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(fy - r))
            wys.append(at * ty)
        accs = [jnp.zeros((rb, d, wpad), jnp.float32) for _ in range(hp)]
        if mode == "finer":
            span = rb
        elif mode == "same":
            span = (w - 1) + rb
        else:
            span = k * (w - 1) + rb
        for c in range(w):
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - c))
            # per-(r, head) dense cell weights, tent math shared across
            # the packed heads
            cws = []
            for r in range(w):
                m = wys[r] * tx  # (rb, HP*P, WPAD)
                cws.append(
                    [
                        jnp.sum(
                            m[:, h * p : (h + 1) * p], axis=1, keepdims=True
                        ).astype(jnp.bfloat16)
                        for h in range(hp)
                    ]
                )
            if mode == "same":
                row_lo = i + 1
                col0 = c + 1
            elif mode == "coarser":
                row_lo = i + k - k // 2
                col0 = k * (c + 1) - k // 2
            for h in range(hp):
                racc = jnp.zeros((rb, d, wpad), jnp.bfloat16)
                if mode == "finer":
                    for r in range(w):
                        phase, row_off, fcol0 = cellmap[(r, c)]
                        row0 = phase * phase_rows + i + row_off
                        slab = _finer_slab(
                            v_ref, 0, h, row0, rb, d, fcol0, wpad
                        )
                        racc = racc + cws[r][h] * slab
                else:
                    tall = v_ref[
                        0, h, pl.ds(row_lo, span), :, col0 : col0 + wpad
                    ]  # (span, D, WPAD) bf16
                    step = 1 if mode == "same" else k
                    for r in range(w):
                        slab = jax.lax.slice(
                            tall, (step * r, 0, 0), (step * r + rb, d, wpad)
                        )
                        racc = racc + cws[r][h] * slab
                accs[h] = accs[h] + racc.astype(jnp.float32)
        for h in range(hp):
            o_ref[0, h, pl.ds(i, rb)] = accs[h].astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, ha // rb, row_block, 0)


def _finer_slab(v_ref, bi, h, row0, rb, d, col0, wpad):
    """Narrow finer-mode phase read, zero-padded to wpad lanes in
    registers (full-wpad phase copies waste up to 4x VMEM)."""
    narrow = v_ref.shape[-1] - col0
    if narrow >= wpad:
        return v_ref[bi, h, pl.ds(row0, rb), :, col0 : col0 + wpad]
    return jnp.concatenate(
        [
            v_ref[bi, h, pl.ds(row0, rb), :, col0:],
            jnp.zeros((rb, d, wpad - narrow), jnp.bfloat16),
        ],
        axis=2,
    )


def _merged_kernel_packed(
    *refs,
    rb: int,
    ha: int,
    d: int,
    p: int,
    wpad: int,
    # (mode, k, phase_rows, window) per value level: the window may
    # differ per level (mixed windows, e.g. (8, 6, 4) over value strides
    # (8, 16, 32) — constant clamp reach in pixels at 116 instead of 192
    # dense cells)
    level_cfgs: Tuple[Tuple[str, int, int, int], ...],
    hp: int,
    out_t: bool = False,  # store (D, HA, WPAD) channels-major per head
    sparse: bool = False,  # data-dependent cell-liveness skipping
):
    """All value levels of one query level in ONE kernel launch.

    refs = (v_0..v_{nl-1}, fx_0.., fy_0.., at_0.., [masks,] o_ref). Fixed
    per-``pallas_call`` cost measured at ~0.6 ms on v5e through 9
    pair-launches per encoder layer; merging the value levels into one
    launch per query level (3 total) removes ~2/3 of it AND keeps the
    cross-level accumulator in registers instead of materializing three
    (B, H, HA, D, WPAD) partial outputs that XLA then adds.

    With ``sparse``, an SMEM mask (one int32 word per (row block, value
    level, window column); bit r = 'some query in this row block has
    bilinear tent support in cell (r, c)') predicates each column and
    each cell of the loop via lax.cond: P=4 points touch at most 16 of
    64 dense cells per (query, head, level) at W=8, so the dense loop
    pays up to 4x the necessary slab FMAs. Masks are built from min/max
    coordinate rectangles per (head, point) over the row block — exact
    whenever offsets are block-constant, conservative otherwise, so the
    output is ALWAYS identical to the dense loop (skipped cells carry
    zero tent weight for every query in the block). The counterpart
    dense cost lives in the reference's mmcv ms_deform_attn CUDA kernel
    (P=4 gather points, no window).
    """
    nl = len(level_cfgs)
    v_refs = refs[:nl]
    fx_refs = refs[nl : 2 * nl]
    fy_refs = refs[2 * nl : 3 * nl]
    at_refs = refs[3 * nl : 4 * nl]
    if sparse:
        mask_ref = refs[4 * nl]
        o_ref = refs[4 * nl + 1]
    else:
        mask_ref = None
        o_ref = refs[4 * nl]

    n_scr = _num_scratches(level_cfgs)
    ref0 = 4 * nl + (2 if sparse else 1)
    scr_refs = refs[ref0 : ref0 + n_scr]
    _merged_group_body(
        v_refs, fx_refs, fy_refs, at_refs, mask_ref, o_ref, scr_refs,
        rb=rb, ha=ha, d=d, p=p, wpad=wpad, level_cfgs=level_cfgs, hp=hp,
        out_t=out_t, sparse=sparse,
    )


def _num_scratches(level_cfgs) -> int:
    n = 0
    for cfg in level_cfgs:
        if cfg[0] in ("coarser_small", "same_raw"):
            n += 1
        elif cfg[0] == "finer_raw":
            n += cfg[1]
    return n


def _merged_group_body(
    v_refs, fx_refs, fy_refs, at_refs, mask_ref, o_ref, scr_refs,
    *,
    rb: int,
    ha: int,
    d: int,
    p: int,
    wpad: int,
    level_cfgs: Tuple[Tuple[str, int, int, int], ...],
    hp: int,
    out_t: bool = False,
    sparse: bool = False,
):
    """One query level's full merged-kernel work from explicit refs.

    Factored out of ``_merged_kernel_packed`` so the multi-query-level
    kernel (``_multi_group_kernel``) can run several query levels'
    bodies SEQUENTIALLY inside a single ``pallas_call`` — the coarse
    query levels' launches are fixed-overhead dominated (PERF.md round
    10: stride-16/32 at 10.2/7.5 ms/layer vs 25.9 for stride-8 with
    1/4 and 1/16 of the queries), and one launch per layer removes that
    duplicated per-launch/per-grid-step cost.  The CUDA counterpart runs
    ALL query levels in one launch (mmcv ``ms_deform_attn``,
    /root/reference/configs/instance/coco_b48n17.py:48-58)."""
    nl = len(level_cfgs)
    scr_idx = {}
    n_scr = 0
    for li, cfg in enumerate(level_cfgs):
        if cfg[0] in ("coarser_small", "same_raw"):
            scr_idx[li] = n_scr
            n_scr += 1
        elif cfg[0] == "finer_raw":
            scr_idx[li] = n_scr
            n_scr += cfg[1]
    # static word offset of each level's column words in the mask row
    word_offs = []
    _wo = 0
    for (_m, _k, _pr, _wl) in level_cfgs:
        word_offs.append(_wo)
        _wo += _wl

    cellmaps = [
        {
            (r, c): (ph, ro, co)
            for (r, c, ph, ro, co) in _cell_table(
                "same" if mode == "same_raw" else mode, k, wl
            )
        }
        if mode in ("same", "same_raw", "coarser", "finer")
        else None
        for (mode, k, phase_rows, wl) in level_cfgs
    ]

    # Per grid step, build the padded/expanded value images ONCE in VMEM
    # on the MXU; XLA never materializes them in HBM (the pads, upsample
    # broadcasts and custom-call layout copies around them dominated the
    # round-5 encoder trace):
    # - coarser_small: lanes expand by k via a 0/1 repeat matrix
    #   (big[s, :, c] = small[s, :, c // k]); rows stay small — the cell
    #   loop repeats them with a static pattern.
    # - same_raw: lanes shift right by the window margin via a 0/1 shift
    #   matrix (zero lane margins fall out of the matmul); row margins
    #   are explicit zero stores (row offsets are untiled, so the image
    #   body stores at its offset for free).
    for li, (mode, k, phase_rows, wl) in enumerate(level_cfgs):
        if mode not in ("coarser_small", "same_raw", "finer_raw"):
            continue
        pad_w = wl // 2
        v_ref = v_refs[li]
        rows_s, cols_s = v_ref.shape[2], v_ref.shape[4]
        n_phase = k if mode == "finer_raw" else 1
        mt = _finer_margin(k, wl) if mode == "finer_raw" else 0
        mt_r = (
            max(0, pad_w - 1 - (k - 1) // 2) if mode == "finer_raw" else pad_w
        )
        for pc in range(n_phase):
            scr = scr_refs[scr_idx[li] + pc]
            rows_scr, cols_scr = scr.shape[1], scr.shape[3]
            ci = jax.lax.broadcasted_iota(jnp.int32, (cols_s, cols_scr), 1)
            si = jax.lax.broadcasted_iota(jnp.int32, (cols_s, cols_scr), 0)
            if mode == "coarser_small":
                e = (ci // k == si).astype(jnp.bfloat16)
            elif mode == "same_raw":
                e = (ci == si + pad_w).astype(jnp.bfloat16)
            else:
                # column decimation+shift: scratch lane c' holds raw
                # column k*(c' - mt) + pc (out-of-range -> zero margins)
                e = (k * (ci - mt) + pc == si).astype(jnp.bfloat16)
            for h in range(hp):
                sm = v_ref[0, h]  # (rows_s, d, cols_s)
                # 2-D matmul (Mosaic's MXU path); the reshape merges the
                # untiled leading dim into sublanes — a memory no-op
                big = jnp.dot(
                    sm.reshape(rows_s * d, cols_s),
                    e,
                    preferred_element_type=jnp.float32,
                )  # (rows_s * d, cols_scr)
                body = big.reshape(rows_s, d, cols_scr).astype(jnp.bfloat16)
                if mode == "coarser_small":
                    scr[h] = body
                else:
                    scr[h, mt_r : mt_r + rows_s] = body
                    if mt_r:
                        scr[h, 0:mt_r] = jnp.zeros(
                            (mt_r, d, cols_scr), jnp.bfloat16
                        )
                    if rows_scr > mt_r + rows_s:
                        scr[h, mt_r + rows_s : rows_scr] = jnp.zeros(
                            (rows_scr - mt_r - rows_s, d, cols_scr),
                            jnp.bfloat16,
                        )

    def row_block(ib, _):
        i = ib * rb
        accs = [jnp.zeros((rb, d, wpad), jnp.float32) for _ in range(hp)]
        for li, (mode, k, phase_rows, w) in enumerate(level_cfgs):
            v_ref = v_refs[li]
            cellmap = cellmaps[li]
            fx = fx_refs[li][0, 0, pl.ds(i, rb)]  # (rb, HP*P, WPAD)
            fy = fy_refs[li][0, 0, pl.ds(i, rb)]
            if fx.dtype == jnp.int16:  # fixed-point coords, ulp 1/4096
                fx = fx.astype(jnp.float32) * (1.0 / 4096.0)
                fy = fy.astype(jnp.float32) * (1.0 / 4096.0)
            at = at_refs[li][0, 0, pl.ds(i, rb)].astype(jnp.float32)
            wys = []
            for r in range(w):
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(fy - r))
                wys.append(at * ty)
            if mode in ("same", "same_raw"):
                span = (w - 1) + rb
            elif mode == "coarser":
                span = k * (w - 1) + rb
            elif mode == "coarser_small":
                # small rows touched by big rows [i+ceil(k/2), +k(w-1)+rb)
                pat = [(k - k // 2 + j) // k for j in range(rb)]
                span = w + pat[-1]
            else:
                span = rb
            woff = word_offs[li]
            for c in range(w):
                wd = (
                    mask_ref[0, 0, ib, woff + c] if sparse else None
                )

                def col_fn(accs_t, _c=c, _wd=wd):
                    c = _c
                    tx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - c))
                    cws = []
                    for r in range(w):
                        m = wys[r] * tx
                        cws.append(
                            [
                                jnp.sum(
                                    m[:, h * p : (h + 1) * p],
                                    axis=1,
                                    keepdims=True,
                                ).astype(jnp.bfloat16)
                                for h in range(hp)
                            ]
                        )
                    if mode in ("same", "same_raw"):
                        row_lo = i + 1
                        col0 = c + 1
                    elif mode == "coarser":
                        row_lo = i + k - k // 2
                        col0 = k * (c + 1) - k // 2
                    elif mode == "coarser_small":
                        # big row t = i + ceil(k/2) + k*r + j reads small
                        # row t // k = i // k + r + pat[j]; i // k is
                        # exact because rb % k == 0 (_prep_value_pair)
                        row_lo = i // k
                        col0 = k * (c + 1) - k // 2
                    srcs = talls = None
                    if mode in ("same", "same_raw", "coarser"):
                        srcs = [
                            (
                                scr_refs[scr_idx[li]][
                                    h, pl.ds(row_lo, span), :,
                                    col0 : col0 + wpad,
                                ]
                                if mode == "same_raw"
                                else v_ref[
                                    0, h, pl.ds(row_lo, span), :,
                                    col0 : col0 + wpad,
                                ]
                            )
                            for h in range(hp)
                        ]
                    elif mode == "coarser_small":
                        talls = [
                            scr_refs[scr_idx[li]][
                                h, pl.ds(row_lo, span), :,
                                col0 : col0 + wpad,
                            ]
                            for h in range(hp)
                        ]
                    if mode == "finer_raw":
                        # raw rows strided by k; column phase pc(c) was
                        # decimated into its scratch at build time
                        pad_f = w // 2
                        mt_f = _finer_margin(k, w)
                        mtr_f = max(0, pad_f - 1 - (k - 1) // 2)
                        mc = (k - 1) // 2 + c + 1
                        pcc = (mc - pad_f) % k
                        fcol0 = mt_f + (mc - pad_f - pcc) // k
                        scr_f = scr_refs[scr_idx[li] + pcc]
                    step = 1 if mode in ("same", "same_raw") else k

                    def cell_fn(rs, _r):
                        out = list(rs)
                        for h in range(hp):
                            if mode == "finer":
                                phase, row_off, fc0 = cellmap[(_r, c)]
                                row0 = phase * phase_rows + i + row_off
                                slab = _finer_slab(
                                    v_ref, 0, h, row0, rb, d, fc0, wpad
                                )
                            elif mode == "finer_raw":
                                mr = (k - 1) // 2 + _r + 1
                                base = mtr_f + k * i + (mr - pad_f)
                                tall = scr_f[
                                    h,
                                    pl.ds(base, k * (rb - 1) + 1),
                                    :,
                                    fcol0 : fcol0 + wpad,
                                ]
                                slab = jnp.concatenate(
                                    [
                                        jax.lax.slice(
                                            tall,
                                            (k * j, 0, 0),
                                            (k * j + 1, d, wpad),
                                        )
                                        for j in range(rb)
                                    ],
                                    axis=0,
                                )
                            elif mode == "coarser_small":
                                slab = jnp.concatenate(
                                    [
                                        jax.lax.slice(
                                            talls[h],
                                            (_r + pat[j], 0, 0),
                                            (_r + pat[j] + 1, d, wpad),
                                        )
                                        for j in range(rb)
                                    ],
                                    axis=0,
                                )
                            else:
                                slab = jax.lax.slice(
                                    srcs[h],
                                    (step * _r, 0, 0),
                                    (step * _r + rb, d, wpad),
                                )
                            out[h] = out[h] + cws[_r][h] * slab
                        return tuple(out)

                    raccs = tuple(
                        jnp.zeros((rb, d, wpad), jnp.bfloat16)
                        for _ in range(hp)
                    )
                    for r in range(w):
                        if sparse:
                            raccs = jax.lax.cond(
                                ((_wd >> r) & 1) != 0,
                                functools.partial(cell_fn, _r=r),
                                lambda rs: rs,
                                raccs,
                            )
                        else:
                            raccs = cell_fn(raccs, r)
                    return tuple(
                        a + rc.astype(jnp.float32)
                        for a, rc in zip(accs_t, raccs)
                    )

                if sparse:
                    accs = list(
                        jax.lax.cond(
                            wd != 0, col_fn, lambda a: a, tuple(accs)
                        )
                    )
                else:
                    accs = list(col_fn(tuple(accs)))
        for h in range(hp):
            if out_t:
                # channels-major store (B, NH, D, HA, WPAD): the exit
                # reshape to (B, NH*D, eh, ew) is then a no-op, killing
                # the XLA output-permute pass (round-5 trace: ~16 ms/iter
                # across the encoder). In-register (rb, d, *) ->
                # (d, rb, *) is a VMEM-local sublane restructure.
                o_ref[0, h, :, pl.ds(i, rb)] = jnp.transpose(
                    accs[h].astype(jnp.bfloat16), (1, 0, 2)
                )
            else:
                o_ref[0, h, pl.ds(i, rb)] = accs[h].astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, ha // rb, row_block, 0)


def _mask_words(fx, fy, wl: int, rb: int, qw: int):
    """Cell-liveness words for the sparse merged kernel: for each
    (batch, head-group, row block) an int32 word per window column c,
    bit r set iff SOME (query, head, point) in the block has bilinear
    tent support in cell (r, c) — i.e. |fy - r| < 1 and |fx - c| < 1 for
    some sample. Built from conservative min/max rectangles per
    (head-in-pair, point) slot over the block, so skipped cells are
    provably zero-weight for every query: the sparse kernel's output is
    identical to the dense loop. Exact when offsets are block-constant
    (e.g. the compass init); degrades gracefully (more live cells, same
    result) as trained offsets disperse.

    fx/fy: packed (B, grp, ha_pad, hp*P, wpad) planes — the EXACT arrays
    the kernel reads (int16 fixed-point when DEFORM_COORD16 is on, so
    mask and kernel agree bit-for-bit at tent-support boundaries); lanes
    are sliced to the real ``qw`` so zero-padded lanes cannot pull the
    rectangles toward cell 0."""
    b, grp, ha_pad, hpp, _ = fx.shape
    nb = ha_pad // rb
    scale = 1.0 / 4096.0 if fx.dtype == jnp.int16 else 1.0

    def mm(t):
        t = t[..., :qw].reshape(b, grp, nb, rb, hpp, qw)
        lo = t.min(axis=(3, 5)).astype(jnp.float32) * scale
        hi = t.max(axis=(3, 5)).astype(jnp.float32) * scale
        return lo, hi  # (b, grp, nb, hpp)

    xlo, xhi = mm(fx)
    ylo, yhi = mm(fy)
    idx = jnp.arange(wl, dtype=jnp.float32)
    rowlive = (idx > ylo[..., None] - 1.0) & (idx < yhi[..., None] + 1.0)
    collive = (idx > xlo[..., None] - 1.0) & (idx < xhi[..., None] + 1.0)
    # (b, grp, nb, hpp, wl_r, wl_c) -> any over slots
    live = jnp.any(rowlive[..., :, None] & collive[..., None, :], axis=3)
    bits = live.astype(jnp.int32) << jnp.arange(wl, dtype=jnp.int32)[
        :, None
    ]
    return bits.sum(axis=-2)  # (b, grp, nb, wl): word per column


@functools.lru_cache(maxsize=None)
def _scratch_shapes(level_cfgs, hp, d, ha_pad, wpad):
    """VMEM scratches (see _merged_group_body): lane-expanded small
    image per coarser_small level, padded image per same_raw level, k
    column-phase images per finer_raw level; lanes cover the largest
    static column slice, rounded to full tiles."""
    shapes = []
    for c in level_cfgs:
        wl = c[5]
        if c[0] == "coarser_small":
            shapes.append(
                pltpu.VMEM(
                    (
                        hp,
                        c[3],
                        d,
                        _round_up(wpad + c[1] * (wl + 1), 128),
                    ),
                    jnp.bfloat16,
                )
            )
        elif c[0] == "same_raw":
            shapes.append(
                pltpu.VMEM(
                    (
                        hp,
                        ha_pad + wl + 1,
                        d,
                        _round_up(wpad + wl + 1, 128),
                    ),
                    jnp.bfloat16,
                )
            )
        elif c[0] == "finer_raw":
            k = c[1]
            pad_w = wl // 2
            mt = _finer_margin(k, wl)
            moff = _finer_max_off(k, wl)
            mt_r = max(0, pad_w - 1 - (k - 1) // 2)
            rows_scr = mt_r + max(
                c[3],
                k * (ha_pad - 1) + (k - 1) // 2 + wl - pad_w + 1,
            )
            cols_scr = _round_up(mt + moff + wpad + 1, 128)
            for _ in range(k):
                shapes.append(
                    pltpu.VMEM((hp, rows_scr, d, cols_scr), jnp.bfloat16)
                )
    return shapes


def _pair_backward_fn(level_cfg, b, nh, rb, ha_pad, p, d, wpad, interpret):
    """Differentiable per-(query, value)-pair forward for the VJP: the
    compact in-kernel prep modes map back to their classic XLA preps
    (broadcast / phase decomposition / pad — all differentiable), so the
    backward reuses the proven per-pair backward kernels regardless of
    which forward kernel (single- or multi-query-level) produced the
    output."""
    mode, k, phase_rows, rows_v, cols_v, wl = level_cfg
    if mode == "coarser_small":
        # backward-only: materialize the classic upsampled prep
        # (XLA broadcast, differentiable — its transpose is the
        # k x k block-sum) and reuse the 'coarser' pair backward
        pair_raw = _make_pair_fn(
            (b, nh, wl, rb, ha_pad, p, d, wpad, "coarser", k,
             0, rows_v * k, cols_v * k, interpret, "cell", 1)
        )
        return functools.partial(
            lambda pf, kk, pr, fx, fy, at: pf(
                _expand_coarser(pr, kk), fx, fy, at
            ),
            pair_raw,
            k,
        )
    if mode == "finer_raw":
        # backward-only: classic phase decomposition (reshape/
        # transpose/pad — all differentiable)
        mt = _finer_margin(k, wl)
        moff = _finer_max_off(k, wl)
        ph_rows = mt + ha_pad + moff + 1
        ph_cols = mt + cols_v // k + moff + 2
        pair_raw = _make_pair_fn(
            (b, nh, wl, rb, ha_pad, p, d, wpad, "finer", k,
             ph_rows, k * k * ph_rows, ph_cols, interpret,
             "cell", 1)
        )
        return functools.partial(
            lambda pf, kk, pr, fx, fy, at: pf(
                _decompose_finer(pr, kk, wl, ha_pad)[0],
                fx, fy, at,
            ),
            pair_raw,
            k,
        )
    if mode == "same_raw":
        # backward-only: classic padded prep (pad is
        # differentiable — its transpose is a slice)
        rows_c = ha_pad + wl + 1
        cols_c = wpad + wl + 1
        pair_raw = _make_pair_fn(
            (b, nh, wl, rb, ha_pad, p, d, wpad, "same", 1,
             0, rows_c, cols_c, interpret, "cell", 1)
        )
        pw = wl // 2

        def _pad_same(pr, _rows=rows_c, _cols=cols_c, _pw=pw):
            return jnp.pad(
                pr,
                (
                    (0, 0),
                    (0, 0),
                    (_pw, _rows - _pw - pr.shape[2]),
                    (0, 0),
                    (_pw, _cols - _pw - pr.shape[4]),
                ),
            )

        return functools.partial(
            lambda pf, padf, pr, fx, fy, at: pf(padf(pr), fx, fy, at),
            pair_raw,
            _pad_same,
        )
    return _make_pair_fn(
        (b, nh, wl, rb, ha_pad, p, d, wpad, mode, k,
         phase_rows, rows_v, cols_v, interpret, "cell", 1)
    )


def _make_level_fn(cfg):
    """Cached custom-VJP function for one QUERY level over all value
    levels, with the level-merged packed forward kernel and the per-pair
    backward kernels (same math, so the VJP decomposes per value level).

    cfg = (b, nh, rb, ha_pad, p, d, wpad, hp, interpret,
           level_cfgs[, out_t, sparse, qw]) where level_cfgs is a tuple
    of (mode, k, phase_rows, rows_v, cols_v, window) per value level —
    the window is PER VALUE LEVEL (mixed windows run fewer dense cells
    on coarser value levels) — out_t selects the channels-major output
    layout (B, NH, D, HA, WPAD), and sparse enables the cell-liveness
    masks (qw = real query lanes, for mask rectangles).
    """
    (b, nh, rb, ha_pad, p, d, wpad, hp, interpret, level_cfgs) = cfg[:10]
    out_t = cfg[10] if len(cfg) > 10 else False
    sparse = cfg[11] if len(cfg) > 11 else False
    qw = cfg[12] if len(cfg) > 12 else wpad
    nl = len(level_cfgs)

    def spec(shape, heads=1):
        nd = len(shape)
        return pl.BlockSpec(
            (1, heads) + shape,
            lambda bb, hh: (bb, hh) + (0,) * nd,
            memory_space=pltpu.VMEM,
        )

    # fx/fy/at arrive ALREADY packed ((B, NH/hp, HA, hp*P, WPAD), built
    # with a single fused transpose at the call site); the backward
    # unpacks them for the per-pair backward kernels and repacks the
    # gradients (training-only relayout).
    def unpack(x):
        x = x.reshape(b, nh // hp, ha_pad, hp, p, wpad)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
        return x.reshape(b, nh, ha_pad, p, wpad)

    def repack(x):
        x = x.reshape(b, nh // hp, hp, ha_pad, p, wpad)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
        return x.reshape(b, nh // hp, ha_pad, hp * p, wpad)

    scratch_shapes = _scratch_shapes(level_cfgs, hp, d, ha_pad, wpad)

    def fwd(preps, fxs, fys, ats):
        if _coord16_enabled():
            # quantize the fractional window coordinates to int16 fixed
            # point (ulp 1/4096 of a cell — tent-weight error ~1e-4,
            # far below the kernel's bf16 multiplies). The round/cast
            # fuses into the coordinate-plane producer, so the f32
            # planes never reach HBM on the inference path; the VJP
            # residuals keep the original f32 planes, so training
            # gradients are untouched. DEFORM_COORD16=0 reverts.
            fxs = tuple(
                jnp.round(x * 4096.0).astype(jnp.int16) for x in fxs
            )
            fys = tuple(
                jnp.round(x * 4096.0).astype(jnp.int16) for x in fys
            )
        if sparse:
            # liveness masks from the planes the kernel actually reads
            # (post-quantization: mask and kernel agree exactly at tent
            # boundaries); computed INSIDE fwd so the custom-VJP
            # signature and the backward (dense pair kernels) are
            # untouched
            mwords = jnp.concatenate(
                [
                    _mask_words(
                        fxs[li], fys[li], level_cfgs[li][5], rb, qw
                    )
                    for li in range(nl)
                ],
                axis=-1,
            )  # (B, grp, nb, sum of per-level windows) int32
        kernel = functools.partial(
            _merged_kernel_packed,
            rb=rb, ha=ha_pad, d=d, p=p, wpad=wpad,
            level_cfgs=tuple(c[:3] + (c[5],) for c in level_cfgs), hp=hp,
            out_t=out_t, sparse=sparse,
        )
        wspec = spec((ha_pad, hp * p, wpad))
        out_dims = (d, ha_pad, wpad) if out_t else (ha_pad, d, wpad)
        extra_specs, extra_ops = [], ()
        if sparse:
            nb = ha_pad // rb
            tw = sum(c[5] for c in level_cfgs)
            extra_specs = [
                pl.BlockSpec(
                    (1, 1, nb, tw),
                    lambda bb, hh: (bb, hh, 0, 0),
                    memory_space=pltpu.SMEM,
                )
            ]
            extra_ops = (mwords,)
        return pl.pallas_call(
            kernel,
            grid=(b, nh // hp),
            in_specs=(
                [
                    spec((c[3], d, c[4]), heads=hp)
                    for c in level_cfgs
                ]
                + [wspec] * (3 * nl)
                + extra_specs
            ),
            out_specs=spec(out_dims, heads=hp),
            out_shape=jax.ShapeDtypeStruct(
                (b, nh) + out_dims, jnp.bfloat16
            ),
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(*preps, *fxs, *fys, *ats, *extra_ops)

    def bwd(res, g):
        preps, fxs, fys, ats = res
        if out_t:
            # pair backwards expect the classic (B, NH, HA, D, WPAD)
            # cotangent layout (training-only relayout)
            g = jnp.transpose(g, (0, 1, 3, 2, 4))
        d_preps, d_fxs, d_fys, d_ats = [], [], [], []
        for li, lvl_cfg in enumerate(level_cfgs):
            pair_fn = _pair_backward_fn(
                lvl_cfg, b, nh, rb, ha_pad, p, d, wpad, interpret
            )
            _, pair_bwd = jax.vjp(
                pair_fn,
                preps[li],
                unpack(fxs[li]),
                unpack(fys[li]),
                unpack(ats[li]),
            )
            dp, dfx, dfy, dat = pair_bwd(g)
            d_preps.append(dp)
            d_fxs.append(repack(dfx))
            d_fys.append(repack(dfy))
            d_ats.append(repack(dat))
        return tuple(d_preps), tuple(d_fxs), tuple(d_fys), tuple(d_ats)

    @jax.custom_vjp
    def level_fn(preps, fxs, fys, ats):
        return fwd(preps, fxs, fys, ats)

    level_fn.defvjp(
        lambda preps, fxs, fys, ats: (
            fwd(preps, fxs, fys, ats),
            (preps, fxs, fys, ats),
        ),
        bwd,
    )
    return level_fn


def _multi_group_kernel(*refs, groups, d: int, p: int, hp: int):
    """SEVERAL query levels in ONE kernel launch, run sequentially.

    ``groups`` is a tuple of (rb, ha_pad, wpad, level_cfgs6, out_t) per
    query level; refs = per group (nl preps, nl fx, nl fy, nl at), then
    one output per group, then the groups' scratches in order.  The
    coarse query levels' separate launches are fixed-overhead dominated
    (PERF.md round 10), so folding them into one ``pallas_call`` removes
    the duplicated per-launch and per-grid-step cost; each group's body
    is the proven ``_merged_group_body``.  CUDA counterpart: one launch
    for ALL levels, mmcv ``ms_deform_attn``
    (/root/reference/configs/instance/coco_b48n17.py:48-58)."""
    idx = 0
    g_ins = []
    for (rb, ha, wpad, lcfgs, out_t) in groups:
        nl = len(lcfgs)
        g_ins.append(refs[idx : idx + 4 * nl])
        idx += 4 * nl
    g_outs = refs[idx : idx + len(groups)]
    idx += len(groups)
    for gi, (rb, ha, wpad, lcfgs, out_t) in enumerate(groups):
        nl = len(lcfgs)
        n_scr = _num_scratches(lcfgs)
        scr = refs[idx : idx + n_scr]
        idx += n_scr
        gin = g_ins[gi]
        _merged_group_body(
            gin[:nl],
            gin[nl : 2 * nl],
            gin[2 * nl : 3 * nl],
            gin[3 * nl : 4 * nl],
            None,
            g_outs[gi],
            scr,
            rb=rb,
            ha=ha,
            d=d,
            p=p,
            wpad=wpad,
            level_cfgs=tuple(c[:3] + (c[5],) for c in lcfgs),
            hp=hp,
            out_t=out_t,
            sparse=False,
        )


def _make_multi_level_fn(cfg):
    """Custom-VJP function launching SEVERAL query levels in one
    ``pallas_call`` (see ``_multi_group_kernel``).  The backward
    decomposes per (query level, value level) pair exactly as the
    single-level path — the forward grouping changes launch structure,
    not math.

    cfg = (b, nh, rb, p, d, hp, interpret, groups) with groups a tuple
    of (rb, ha_pad, wpad, level_cfgs6, out_t)."""
    (b, nh, rb, p, d, hp, interpret, groups) = cfg
    grp = nh // hp

    def spec(shape, heads=1):
        nd = len(shape)
        return pl.BlockSpec(
            (1, heads) + shape,
            lambda bb, hh: (bb, hh) + (0,) * nd,
            memory_space=pltpu.VMEM,
        )

    in_specs = []
    out_specs = []
    out_shapes = []
    scratch_shapes = []
    for (g_rb, ha_pad, wpad, lcfgs, out_t) in groups:
        in_specs += [spec((c[3], d, c[4]), heads=hp) for c in lcfgs]
        wspec = spec((ha_pad, hp * p, wpad))
        in_specs += [wspec] * (3 * len(lcfgs))
        out_dims = (d, ha_pad, wpad) if out_t else (ha_pad, d, wpad)
        out_specs.append(spec(out_dims, heads=hp))
        out_shapes.append(
            jax.ShapeDtypeStruct((b, nh) + out_dims, jnp.bfloat16)
        )
        scratch_shapes += _scratch_shapes(lcfgs, hp, d, ha_pad, wpad)

    kernel = functools.partial(
        _multi_group_kernel, groups=groups, d=d, p=p, hp=hp
    )

    def fwd(preps, fxs, fys, ats):
        if _coord16_enabled():
            fxs = tuple(
                tuple(jnp.round(x * 4096.0).astype(jnp.int16) for x in g)
                for g in fxs
            )
            fys = tuple(
                tuple(jnp.round(x * 4096.0).astype(jnp.int16) for x in g)
                for g in fys
            )
        ops = []
        for gi in range(len(groups)):
            ops += (
                list(preps[gi]) + list(fxs[gi]) + list(fys[gi])
                + list(ats[gi])
            )
        return pl.pallas_call(
            kernel,
            grid=(b, grp),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(*ops)

    def bwd(res, g_all):
        preps, fxs, fys, ats = res
        d_preps, d_fxs, d_fys, d_ats = [], [], [], []
        for gi, (g_rb, ha_pad, wpad, lcfgs, out_t) in enumerate(groups):
            g = g_all[gi]
            if out_t:
                g = jnp.transpose(g, (0, 1, 3, 2, 4))

            def unpack(x, _ha=ha_pad, _w=wpad):
                x = x.reshape(b, nh // hp, _ha, hp, p, _w)
                x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
                return x.reshape(b, nh, _ha, p, _w)

            def repack(x, _ha=ha_pad, _w=wpad):
                x = x.reshape(b, nh // hp, hp, _ha, p, _w)
                x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
                return x.reshape(b, nh // hp, _ha, hp * p, _w)

            dg_p, dg_fx, dg_fy, dg_at = [], [], [], []
            for li, lvl_cfg in enumerate(lcfgs):
                pair_fn = _pair_backward_fn(
                    lvl_cfg, b, nh, g_rb, ha_pad, p, d, wpad, interpret
                )
                _, pair_bwd = jax.vjp(
                    pair_fn,
                    preps[gi][li],
                    unpack(fxs[gi][li]),
                    unpack(fys[gi][li]),
                    unpack(ats[gi][li]),
                )
                dp, dfx, dfy, dat = pair_bwd(g)
                dg_p.append(dp)
                dg_fx.append(repack(dfx))
                dg_fy.append(repack(dfy))
                dg_at.append(repack(dat))
            d_preps.append(tuple(dg_p))
            d_fxs.append(tuple(dg_fx))
            d_fys.append(tuple(dg_fy))
            d_ats.append(tuple(dg_at))
        return (
            tuple(d_preps), tuple(d_fxs), tuple(d_fys), tuple(d_ats)
        )

    @jax.custom_vjp
    def multi_fn(preps, fxs, fys, ats):
        return fwd(preps, fxs, fys, ats)

    multi_fn.defvjp(
        lambda preps, fxs, fys, ats: (
            fwd(preps, fxs, fys, ats),
            (preps, fxs, fys, ats),
        ),
        bwd,
    )
    return multi_fn


def _finer_margin(k: int, window: int) -> int:
    """Top/left zero margin (rows/cols, per phase block) of the finer-mode
    prep layout: the smallest ``floor((m - pad) / k)`` over the window's
    sample offsets ``m`` is how far below 0 a phase-row index can reach."""
    pad = window // 2
    lo = min(
        ((k - 1) // 2 + r + 1 - pad) // k for r in range(window)
    )
    return max(0, -lo)


def _finer_max_off(k: int, window: int) -> int:
    pad = window // 2
    return max(((k - 1) // 2 + r + 1 - pad) // k for r in range(window))


def _cell_table(mode: str, k: int, window: int):
    """Static per-cell (r, c) -> (phase_block, row_off, col_off) mapping
    shared by the forward and backward kernels: the forward slab of cell
    (r, c) for query row i lives at prep rows
    ``phase_block * phase_rows + i + row_off`` and prep columns
    ``[col_off, col_off + wpad)``.

    Finer mode indexes the decompose-then-pad layout built by
    :func:`_prep_value_pair`: phase block ``pr * k + pc`` holds
    ``vimg[k*R + pr, k*C + pc]`` at (margin + R, margin + C), so the
    sample at vimg row ``k*i + m - pad`` lives in phase ``(m - pad) % k``
    at row ``margin + i + floor((m - pad) / k)``."""
    pad = window // 2
    mt = _finer_margin(k, window)
    cells = []
    for r in range(window):
        for c in range(window):
            if mode == "same":
                cells.append((r, c, 0, r + 1, c + 1))
            elif mode == "coarser":
                cells.append(
                    (r, c, 0, k * (r + 1) - k // 2, k * (c + 1) - k // 2)
                )
            else:  # finer
                mr = (k - 1) // 2 + r + 1
                mc = (k - 1) // 2 + c + 1
                pr = (mr - pad) % k
                pc = (mc - pad) % k
                cells.append(
                    (
                        r,
                        c,
                        pr * k + pc,
                        mt + (mr - pad - pr) // k,
                        mt + (mc - pad - pc) // k,
                    )
                )
    return cells


def _bwd_query_kernel(
    v_ref,  # (1, 1, ROWS, D, VLANES) prep, bf16
    fx_ref,  # (1, 1, HA, P, WPAD) f32
    fy_ref,
    at_ref,  # bf16
    g_ref,  # (1, 1, HA, D, WPAD) cotangent, bf16
    dfx_ref,  # (1, 1, HA, P, WPAD) f32
    dfy_ref,
    dat_ref,
    *,
    window: int,
    rb: int,
    ha: int,
    d: int,
    wpad: int,
    mode: str,
    k: int,
    phase_rows: int,
):
    cells = _cell_table(mode, k, window)

    def row_block(ib, _):
        i = ib * rb
        fx = fx_ref[0, 0, pl.ds(i, rb)]
        fy = fy_ref[0, 0, pl.ds(i, rb)]
        at = at_ref[0, 0, pl.ds(i, rb)].astype(jnp.float32)
        g = g_ref[0, 0, pl.ds(i, rb)].astype(jnp.float32)  # (rb, D, WPAD)
        dfx = jnp.zeros_like(fx)
        dfy = jnp.zeros_like(fy)
        dat = jnp.zeros_like(fx)
        for r in range(window):
            dy = fy - r
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
            dty = jnp.where(jnp.abs(dy) < 1.0, -jnp.sign(dy), 0.0)
            for (rr, c, phase, row_off, col0) in cells:
                if rr != r:
                    continue
                dx = fx - c
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(dx))
                dtx = jnp.where(jnp.abs(dx) < 1.0, -jnp.sign(dx), 0.0)
                row0 = phase * phase_rows + i + row_off
                if mode == "finer":
                    slab = _finer_slab(
                        v_ref, 0, 0, row0, rb, d, col0, wpad
                    ).astype(jnp.float32)
                else:
                    slab = v_ref[
                        0, 0, pl.ds(row0, rb), :, col0 : col0 + wpad
                    ].astype(jnp.float32)
                s = jnp.sum(g * slab, axis=1, keepdims=True)  # (rb,1,WPAD)
                dat = dat + (ty * tx) * s
                dfx = dfx + (at * ty * dtx) * s
                dfy = dfy + (at * dty * tx) * s
        dfx_ref[0, 0, pl.ds(i, rb)] = dfx
        dfy_ref[0, 0, pl.ds(i, rb)] = dfy
        dat_ref[0, 0, pl.ds(i, rb)] = dat
        return 0

    jax.lax.fori_loop(0, ha // rb, row_block, 0)


def _bwd_prep_kernel(
    fx_ref,  # (1, 1, RPAD, P, WPAD) f32, rows padded by rmt on top
    fy_ref,
    at_ref,  # bf16
    g_ref,  # (1, 1, RPAD, D, WPAD) bf16
    dv_ref,  # (1, 1, ROWS, D, VLANES) d_prep, bf16
    *,
    window: int,
    rb: int,
    d: int,
    wpad: int,
    mode: str,
    k: int,
    phase_rows: int,
    rmt: int,  # top row margin of the padded query-aligned inputs
    rows_out: int,  # rows per phase block of d_prep
    n_phase: int,
    cols_v: int,
):
    cells = _cell_table(mode, k, window)
    nblocks = (rows_out + rb - 1) // rb

    def make_body(phase):
        cells_p = [cc for cc in cells if cc[2] == phase]

        def body(tb, _):
            # last block clamps so writes stay inside this phase region
            # (overlapping rows are recomputed identically)
            t = jnp.minimum(tb * rb, rows_out - rb)
            acc = jnp.zeros((rb, d, cols_v), jnp.float32)
            for (r, c, _, row_off, col0) in cells_p:
                i_row = t - row_off + rmt
                fx = fx_ref[0, 0, pl.ds(i_row, rb)]
                fy = fy_ref[0, 0, pl.ds(i_row, rb)]
                at = at_ref[0, 0, pl.ds(i_row, rb)].astype(jnp.float32)
                g = g_ref[0, 0, pl.ds(i_row, rb)].astype(jnp.float32)
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(fy - r))
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - c))
                cw = jnp.sum(at * ty * tx, axis=1, keepdims=True)
                cwg = cw * g  # (rb, D, WPAD)
                # deposit at prep columns [col0, col0 + wpad); cwg past
                # the (possibly lane-narrow) prep width corresponds to
                # zero-cotangent padded query lanes and is dropped; skip
                # zero-width pieces (Mosaic rejects 0-size vectors)
                width = min(wpad, cols_v - col0)
                parts = []
                if col0 > 0:
                    parts.append(jnp.zeros((rb, d, col0), jnp.float32))
                parts.append(
                    cwg if width == wpad
                    else jax.lax.slice(cwg, (0, 0, 0), (rb, d, width))
                )
                tail = cols_v - col0 - width
                if tail > 0:
                    parts.append(jnp.zeros((rb, d, tail), jnp.float32))
                acc = acc + (
                    parts[0] if len(parts) == 1
                    else jnp.concatenate(parts, axis=2)
                )
            dv_ref[0, 0, pl.ds(phase * rows_out + t, rb)] = acc.astype(
                dv_ref.dtype
            )
            return 0

        return body

    for phase in range(n_phase):
        jax.lax.fori_loop(0, nblocks, make_body(phase), 0)


@functools.lru_cache(maxsize=None)
def _make_pair_fn(cfg):
    """Cached custom-VJP pair function for one static configuration.

    cfg = (b, nh, window, rb, ha_pad, p, d, wpad, mode, k, phase_rows,
           rows_v, cols_v, interpret, variant, hp)

    ``variant``: 'cell' = original per-cell forward kernel; 'packed' =
    head-packed column-outer forward (``_pair_kernel_packed``). Both share
    the same backward kernels (the VJP is of the same math).
    """
    (b, nh, window, rb, ha_pad, p, d, wpad, mode, k, phase_rows, rows_v,
     cols_v, interpret, variant, hp) = cfg

    def spec(shape, heads=1):
        nd = len(shape)
        return pl.BlockSpec(
            (1, heads) + shape,
            lambda bb, hh: (bb, hh) + (0,) * nd,
            memory_space=pltpu.VMEM,
        )

    def fwd_cell(prep, fx, fy, at):
        kernel = functools.partial(
            _pair_kernel, window=window, rb=rb, ha=ha_pad, d=d, wpad=wpad,
            mode=mode, k=k, phase_rows=phase_rows,
        )
        return pl.pallas_call(
            kernel,
            grid=(b, nh),
            in_specs=[
                spec((rows_v, d, cols_v)),
                spec((ha_pad, p, wpad)),
                spec((ha_pad, p, wpad)),
                spec((ha_pad, p, wpad)),
            ],
            out_specs=spec((ha_pad, d, wpad)),
            out_shape=jax.ShapeDtypeStruct(
                (b, nh, ha_pad, d, wpad), jnp.bfloat16
            ),
            interpret=interpret,
        )(prep, fx, fy, at)

    def fwd_packed(prep, fx, fy, at):
        def pack(x):  # (B, NH, HA, P, WPAD) -> (B, NH/hp, HA, hp*P, WPAD)
            x = x.reshape(b, nh // hp, hp, ha_pad, p, wpad)
            x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
            return x.reshape(b, nh // hp, ha_pad, hp * p, wpad)

        kernel = functools.partial(
            _pair_kernel_packed, window=window, rb=rb, ha=ha_pad, d=d,
            p=p, wpad=wpad, mode=mode, k=k, phase_rows=phase_rows, hp=hp,
        )
        return pl.pallas_call(
            kernel,
            grid=(b, nh // hp),
            in_specs=[
                spec((rows_v, d, cols_v), heads=hp),
                spec((ha_pad, hp * p, wpad)),
                spec((ha_pad, hp * p, wpad)),
                spec((ha_pad, hp * p, wpad)),
            ],
            out_specs=spec((ha_pad, d, wpad), heads=hp),
            out_shape=jax.ShapeDtypeStruct(
                (b, nh, ha_pad, d, wpad), jnp.bfloat16
            ),
            # the 2-head block set exceeds the default 16M scoped-vmem
            # budget at the flagship stride-8 pair; v5e has 128M VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(prep, pack(fx), pack(fy), pack(at))

    fwd = fwd_packed if variant == "packed" else fwd_cell

    def bwd(res, g):
        prep, fx, fy, at = res
        g = g.astype(jnp.bfloat16)

        # --- query-aligned grads ---
        qk = functools.partial(
            _bwd_query_kernel, window=window, rb=rb, ha=ha_pad, d=d,
            wpad=wpad, mode=mode, k=k, phase_rows=phase_rows,
        )
        f32q = jax.ShapeDtypeStruct((b, nh, ha_pad, p, wpad), jnp.float32)
        dfx, dfy, dat = pl.pallas_call(
            qk,
            grid=(b, nh),
            in_specs=[
                spec((rows_v, d, cols_v)),
                spec((ha_pad, p, wpad)),
                spec((ha_pad, p, wpad)),
                spec((ha_pad, p, wpad)),
                spec((ha_pad, d, wpad)),
            ],
            out_specs=(
                spec((ha_pad, p, wpad)),
                spec((ha_pad, p, wpad)),
                spec((ha_pad, p, wpad)),
            ),
            out_shape=(f32q, f32q, f32q),
            interpret=interpret,
        )(prep, fx, fy, at, g)

        # --- prep-aligned d_value ---
        cells = _cell_table(mode, k, window)
        rmt = max(cc[3] for cc in cells)  # max row offset
        n_phase = k * k if mode == "finer" else 1
        rows_out = phase_rows if mode == "finer" else rows_v
        # rows margin: reads span [t - row_off + rmt, ... + rb) for
        # t <= rows_out - rb, so the padded height must reach rmt+rows_out+rb
        rpad = rmt + rows_out + rb

        def pad_rows(x):
            return jnp.pad(
                x, ((0, 0), (0, 0), (rmt, rpad - rmt - ha_pad), (0, 0), (0, 0))
            )

        pk = functools.partial(
            _bwd_prep_kernel, window=window, rb=rb, d=d, wpad=wpad,
            mode=mode, k=k, phase_rows=phase_rows, rmt=rmt,
            rows_out=rows_out, n_phase=n_phase, cols_v=cols_v,
        )
        dprep = pl.pallas_call(
            pk,
            grid=(b, nh),
            in_specs=[
                spec((rpad, p, wpad)),
                spec((rpad, p, wpad)),
                spec((rpad, p, wpad)),
                spec((rpad, d, wpad)),
            ],
            out_specs=spec((n_phase * rows_out, d, cols_v)),
            out_shape=jax.ShapeDtypeStruct(
                (b, nh, n_phase * rows_out, d, cols_v), jnp.bfloat16
            ),
            interpret=interpret,
        )(pad_rows(fx), pad_rows(fy), pad_rows(at), pad_rows(g))
        # n_phase * rows_out == rows_v by construction
        return dprep, dfx, dfy, dat.astype(at.dtype)

    @jax.custom_vjp
    def pair_fn(prep, fx, fy, at):
        return fwd(prep, fx, fy, at)

    pair_fn.defvjp(
        lambda prep, fx, fy, at: (
            fwd(prep, fx, fy, at),
            (prep, fx, fy, at),
        ),
        bwd,
    )
    return pair_fn


def _expand_coarser(vp_small: jnp.ndarray, k: int) -> jnp.ndarray:
    """Materialize the k x k upsample of the padded small value image:
    ``big[..., t, :, c] = vp_small[..., t // k, :, c // k]`` as ONE
    broadcast+reshape pass. Used by the classic 'coarser' prep and by the
    backward of the compact path (where the forward kernel expands
    in-VMEM instead — see ``_merged_kernel_packed``)."""
    bs, hs, rs, ds, cs = vp_small.shape
    return jnp.broadcast_to(
        vp_small[:, :, :, None, :, :, None],
        (bs, hs, rs, k, ds, cs, k),
    ).reshape(bs, hs, rs * k, ds, cs * k)


def _compact_enabled() -> bool:
    """DEFORM_COMPACT=0 reverts to the classic XLA-materialized preps
    (debug/A-B knob; read at trace time like DEFORM_RB)."""
    import os

    return os.environ.get("DEFORM_COMPACT", "1") != "0"


def _coord16_enabled() -> bool:
    """DEFORM_COORD16=0 keeps f32 fractional-coordinate planes on the
    merged forward path (debug/A-B knob, read at trace time)."""
    import os

    return os.environ.get("DEFORM_COORD16", "1") != "0"


def _out_t_enabled() -> bool:
    """DEFORM_OUT_T=0 keeps the classic (B, NH, HA, D, WPAD) merged
    output layout instead of channels-major (debug/A-B knob)."""
    import os

    return os.environ.get("DEFORM_OUT_T", "1") != "0"


def _sparse_enabled() -> bool:
    """DEFORM_SPARSE=1 enables the data-dependent cell-liveness masks
    in the merged kernel (A/B knob; read at trace time).

    Default OFF: on-chip at the flagship W=8 stride-8 shape the
    lax.cond-predicated loop measured 35.40 ms vs 19.08 ms dense
    (work_dirs/r4_tpu/check_sparse_w8.log) — Mosaic's predication
    overhead exceeds the skipped cell work even at block-constant
    offsets, exactly the risk NEXT.md round-3 flagged. The masks remain
    exact (tests/test_deform_windowed.py) for future grid-granularity
    skipping designs."""
    import os

    return os.environ.get("DEFORM_SPARSE", "0") != "0"


def _qmerge_groups(nl_q: int, hps) -> Tuple[Tuple[int, ...], ...]:
    """Partition query levels into launch groups per DEFORM_QMERGE:

    - '0' (default): one launch per query level (round-4 behavior),
    - 'coarse': fold every query level EXCEPT the finest into one
      launch — the coarse levels are the fixed-overhead-dominated ones
      (PERF.md round 10: stride-16/32 at 10.2/7.5 ms/layer carry 1/4
      and 1/16 of stride-8's queries),
    - 'all': one launch for everything (the CUDA kernel's structure).

    Levels with differing per-level hp (DEFORM_HP list) cannot share a
    grid and stay singleton.  Sparse masks are per-single-level only, so
    an enabled DEFORM_SPARSE also forces singletons."""
    import os

    mode = os.environ.get("DEFORM_QMERGE", "0")
    if mode == "0" or nl_q < 2 or _sparse_enabled():
        return tuple((i,) for i in range(nl_q))
    start = 1 if mode == "coarse" else 0
    groups = [(i,) for i in range(start)]
    bulk = []
    for i in range(start, nl_q):
        if bulk and hps[i] != hps[bulk[0]]:
            groups.append(tuple(bulk))
            bulk = []
        bulk.append(i)
    if len(bulk) == 1:
        groups.append((bulk[0],))
    elif bulk:
        groups.append(tuple(bulk))
    return tuple(groups)


def _heads_per_step(nh: int, q_level: int = 0) -> int:
    """Heads packed per merged-kernel grid step. DEFORM_HP (default 2)
    is an on-chip A/B knob: hp=4 halves the grid (less launch/pipeline
    overhead, more weight-vreg reuse) at 2x the per-step VMEM.

    A comma list ("2,4,4") sets hp PER QUERY LEVEL (finest first): the
    coarse query levels' launches are fixed-overhead dominated (PERF.md
    round 10: stride-16/32 run 10.2/7.5 ms/layer at 1/4 and 1/16 of
    stride-8's queries), and their per-step VMEM footprint is small, so
    packing more heads per grid step amortizes the per-step prep builds
    where it is cheapest. A short list extends with its last entry."""
    import os

    spec = os.environ.get("DEFORM_HP", "2").split(",")
    hp = int(spec[min(q_level, len(spec) - 1)])
    if hp < 1 or hp > 64 or (hp & (hp - 1)) != 0:
        raise ValueError(f"DEFORM_HP={hp}: must be a power of two in [1, 64]")
    while nh % hp:  # clamp to a divisor (tiny test configs have NH=2)
        hp //= 2
    return hp


def _norm_windows(window, nl: int) -> Tuple[int, ...]:
    """Normalize an int or per-value-level window spec to one int per
    value level (mixed windows, e.g. (8, 6, 4) over value strides
    (8, 16, 32): constant clamp reach in pixels at 116 instead of 192
    dense cells per query)."""
    if isinstance(window, (int, float)):
        return (int(window),) * nl
    ws = tuple(int(x) for x in window)
    if len(ws) != nl:
        raise ValueError(f"per-level window {ws}: expected {nl} entries")
    return ws


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
    compact: bool = False,
):
    """Align the value image to the query grid so that every window-cell
    slab inside the kernel is a static slice. Returns (prep, mode, k,
    phase_rows). All ops are dense (pad / repeat / strided slice).

    With ``compact`` (merged-kernel callers only), coarser pairs skip the
    k x k upsample materialization entirely: the prep is just the PADDED
    SMALL image (mode 'coarser_small') and the merged kernel expands it
    on-chip — the round-5 batch-16 trace showed the upsampled-prep
    pads/copies at ~60-90 ms/iter of the 403 ms pixel decoder."""
    w = window
    pad = w // 2
    b, h, _, d, _ = vimg.shape

    if ha == hb and wa == wb:
        if compact and _compact_enabled():
            # merged kernel pads in-VMEM (rows: margin stores, lanes: an
            # MXU shift matrix); the raw image is ALSO the same tensor
            # for every query level that samples this value level, so
            # XLA CSEs any custom-call layout copy across launches
            return vimg, "same_raw", 1, 0
        # rows [i+1, i+w] cols [c+1, c+1+wpad]; row indices reach
        # (ha_pad-1) + w, columns reach w + wpad
        rows = ha_pad + w + 1
        cols = wpad + w + 1
        prep = jnp.pad(
            vimg,
            (
                (0, 0),
                (0, 0),
                (pad, rows - pad - hb),
                (0, 0),
                (pad, cols - pad - wb),
            ),
        )
        return prep, "same", 1, 0

    if hb < ha:  # value coarser by k: pad SMALL, then one big repeat
        k = ha // hb
        assert k * hb == ha and k * wb == wa, (ha, wa, hb, wb)
        # row indices reach (ha_pad-1) + k*w - k//2; cols k*(w+1) - k//2 + wpad.
        # Padding the small image first and repeating once keeps the big
        # materialization to a SINGLE pass (the round-4 trace showed
        # repeat-then-pad as two full-size passes, ~1.5 ms each at the
        # flagship batch-16 coarser pairs); the target extents round up
        # to multiples of k, which only costs a few extra VMEM rows.
        rows = max(k * (hb + 2 * pad), ha_pad + k * w + 1)
        cols = max(k * (wb + 2 * pad), wpad + k * (w + 1) + 1)
        rows_small = (rows + k - 1) // k
        cols_small = (cols + k - 1) // k
        vp_small = jnp.pad(
            vimg,
            (
                (0, 0),
                (0, 0),
                (pad, rows_small - pad - hb),
                (0, 0),
                (pad, cols_small - pad - wb),
            ),
        )
        if compact and _compact_enabled() and k in (2, 4) and rb % k == 0:
            # merged kernel expands in-VMEM; the static small-row pattern
            # in the kernel needs rb % k == 0 so i // k is exact
            return vp_small, "coarser_small", k, 0
        # k x k upsample as ONE broadcast+reshape pass (two chained
        # jnp.repeat calls materialized the full-size image twice,
        # ~38 ms/iter across the encoder in the round-5 trace)
        return _expand_coarser(vp_small, k), "coarser", k, 0

    # value finer by k: k x k phase decomposition, decompose-then-pad.
    # Strided lane slices lower as gathers on TPU (measured 7.5 ms/layer,
    # round-3 trace), so phases must land as contiguous row blocks; the
    # earlier pad-then-decompose ordering paid a FULL-SIZE pad pass in a
    # pathological {d-minor} layout (~1.8 ms each, round-5 trace) before
    # the space-to-depth transpose.
    k = hb // ha
    assert k * ha == hb and k * wa == wb, (ha, wa, hb, wb)
    if compact and _compact_enabled() and k in (2, 4):
        # merged kernel builds k COLUMN-phase images in VMEM via MXU
        # decimation matrices; rows stay raw (the cell loop strides them
        # by k with static single-row slices)
        return vimg, "finer_raw", k, 0
    prep, phase_rows = _decompose_finer(vimg, k, w, ha_pad)
    return prep, "finer", k, phase_rows


def _decompose_finer(vimg: jnp.ndarray, k: int, w: int, ha_pad: int):
    """Classic finer prep: k x k phase decomposition of the raw image
    (one space-to-depth reshape/transpose) padded in phase space, where
    XLA fuses the pad into the transpose's output write. Lanes hold only
    the real decimated width (~wa) plus the shift margin; the kernels
    read this narrow slab and zero-pad it to wpad in registers —
    full-wpad phase copies waste up to 4x VMEM and OOM the backward
    kernels. Also used by the backward of the compact 'finer_raw' path."""
    b_, h_, hb, d_, wb = vimg.shape
    ha, wa = hb // k, wb // k
    mt = _finer_margin(k, w)
    moff = _finer_max_off(k, w)
    phase_rows = mt + ha_pad + moff + 1
    phase_cols = mt + wa + moff + 2
    ph = vimg.reshape(b_, h_, ha, k, d_, wa, k)
    ph = jnp.transpose(ph, (0, 1, 3, 6, 2, 4, 5))  # (B,H,kr,kc,R,D,C)
    ph = jnp.pad(
        ph,
        (
            (0, 0),
            (0, 0),
            (0, 0),
            (0, 0),
            (mt, phase_rows - mt - ha),
            (0, 0),
            (mt, phase_cols - mt - wa),
        ),
    )
    prep = ph.reshape(b_, h_, k * k * phase_rows, d_, phase_cols)
    return prep, phase_rows


def windowed_ms_deform_attn_pallas_cm(
    values: Sequence[jnp.ndarray],  # per level (B, NH, eh, D, ew) bf16
    spatial_shapes: Sequence[Tuple[int, int]],  # true (h, w) per level
    orientations: Sequence[bool],  # True = stored transposed (lanes = h)
    offsets: Sequence[jnp.ndarray],  # per level (B,NH,L,P,2,eh,ew), CELL
    # units of the sampled value level, clipped to +-(w/2-1); any float
    # dtype (bf16 halves the largest intermediate of the coordinate
    # pipeline — offsets are learned, so 0.4% relative error is noise
    # next to the int16 plane quantization downstream)
    reference_points: Sequence[jnp.ndarray],  # per level (2, eh, ew)
    # normalized grid centers in stored orientation, channel 0 = x
    attention: Sequence[jnp.ndarray],  # per level (B,NH,L,P,eh,ew)
    window=DEFAULT_WINDOW,  # int or per-VALUE-level tuple (mixed windows)
    interpret: bool = False,
) -> List[jnp.ndarray]:
    """Channels-major entry: all inputs/outputs keep each level's spatial
    lane dim (``ew``) on lanes, so the packing into kernel layout is a
    sublane-level permute instead of the lane relayouts that dominate the
    token-layout entry (round-4 trace: ~30 ms/layer of XLA around 24 ms
    of kernels at batch 16). Used by models/deformable_cm.py; the
    token-layout ``windowed_ms_deform_attn_pallas`` remains for direct
    drop-in use.

    Taking raw CELL-UNIT offsets + constant reference planes (instead of
    the reference's normalized ``sampling_locations``) lets the whole
    coordinate chain — reference scaling, anchor subtraction, window
    clip, int16 quantization — fuse into the single pass that writes the
    packed coordinate planes: the normalized-locations tensor
    (B, NH, L, P, 2, eh, ew) f32 never materializes (~0.2 GB/level at
    the flagship batch).

    Per level ``(eh, ew)`` is ``(h, w)`` or, when ``orientations[l]``,
    ``(w, h)``; ``offsets[..., 0, :, :]`` is always the x coordinate.
    Returns CHANNELS-MAJOR outputs per level: (B, NH, D, eh, ew) bf16 —
    with DEFORM_OUT_T (default) the kernel stores that layout directly,
    so the caller's reshape to (B, NH*D, eh, ew) is a no-op.
    """
    import os

    b, nh, _, d, _ = values[0].shape
    nl = len(spatial_shapes)
    p = offsets[0].shape[3]
    wins = _norm_windows(window, nl)
    assert nh % 2 == 0, "channels-major path requires an even head count"
    interpret = interpret or jax.default_backend() == "cpu"

    rb = int(os.environ.get("DEFORM_RB", "4"))
    if rb < 1 or rb > 64 or (rb & (rb - 1)) != 0:
        raise ValueError(
            f"DEFORM_RB={rb}: row-block size must be a power of two "
            "in [1, 64] (odd sizes hit a ~1000x Mosaic retiling cliff)"
        )
    if _out_t_enabled():
        # channels-major store puts HA on the sublane axis: Mosaic
        # requires the dynamic row-block store offset (ib * rb) to be
        # provably 8-aligned (real-TPU lowering error, round-3 probe) —
        # interpret mode can't see this, so clamp everywhere for parity
        rb = max(rb, 8)

    # value images per (level, required orientation); stored orientation
    # is free, the other one is a lane transpose (only mismatched pairs
    # pay it, once per level thanks to the cache)
    _vcache = {}

    def vimg(li, want_tr):
        key = (li, want_tr)
        if key not in _vcache:
            v = values[li]
            if want_tr != orientations[li]:
                v = jnp.transpose(v, (0, 1, 4, 3, 2))
            _vcache[key] = v
        return _vcache[key]

    packs = []
    for ai, (ha, wa) in enumerate(spatial_shapes):
        hp = _heads_per_step(nh, ai)
        grp = nh // hp
        tr = bool(orientations[ai])
        qh, qw = (wa, ha) if tr else (ha, wa)
        ha_pad = _round_up(qh, rb)
        wpad = _round_up(qw, 128)
        lane_i, row_i = (1, 0) if tr else (0, 1)

        merged = []
        for bi, (hb, wb) in enumerate(spatial_shapes):
            w = wins[bi]  # per-value-level window
            vh, vw = (wb, hb) if tr else (hb, wb)
            ax = jnp.asarray(_anchor(qw, vw, w), jnp.float32)  # lane anchor
            ay = jnp.asarray(_anchor(qh, vh, w), jnp.float32)  # row anchor
            prep, mode, k, phase_rows = _prep_value_pair(
                vimg(bi, tr), qh, qw, vh, vw, w, wpad, rb, ha_pad,
                compact=True,
            )

            # (B, NH, P, eh, ew) coordinate planes for this value level:
            # base = reference center in value-cell units minus the
            # per-position window anchor — a CONSTANT (eh, ew) plane
            # (reference_points are trace-time constants, XLA folds it);
            # the offsets add is the only data-dependent term, so the
            # whole chain fuses into the packed-plane write
            base_x = (
                reference_points[ai][lane_i].astype(jnp.float32) * vw
                - 0.5
                - ax[None, :]
            )  # (eh, ew)
            base_y = (
                reference_points[ai][row_i].astype(jnp.float32) * vh
                - 0.5
                - ay[:, None]
            )
            offs_x = offsets[ai][:, :, bi, :, lane_i].astype(jnp.float32)
            offs_y = offsets[ai][:, :, bi, :, row_i].astype(jnp.float32)
            fx = jnp.clip(
                base_x[None, None, None] + offs_x, 0, w - 1
            )
            fy = jnp.clip(
                base_y[None, None, None] + offs_y, 0, w - 1
            )
            at = attention[ai][:, :, bi]  # (B, NH, P, eh, ew)

            def pk(x, dt):
                # (B, (grp hp), P, eh, ew) -> (B, grp, ha_pad, hp*P, wpad):
                # lanes (ew) unchanged -> sublane-level permute only
                x = x.reshape(b, grp, hp, p, qh, qw)
                x = jnp.transpose(x, (0, 1, 4, 2, 3, 5))
                x = x.reshape(b, grp, qh, hp * p, qw).astype(dt)
                return jnp.pad(
                    x,
                    (
                        (0, 0),
                        (0, 0),
                        (0, ha_pad - qh),
                        (0, 0),
                        (0, wpad - qw),
                    ),
                )

            merged.append(
                (
                    prep,
                    pk(fx, jnp.float32),
                    pk(fy, jnp.float32),
                    pk(at, jnp.bfloat16),
                    mode,
                    k,
                    phase_rows,
                    w,
                )
            )

        level_cfgs = tuple(
            (m[4], m[5], m[6], m[0].shape[2], m[0].shape[4], m[7])
            for m in merged
        )
        packs.append(
            dict(
                hp=hp,
                ha_pad=ha_pad,
                wpad=wpad,
                qh=qh,
                qw=qw,
                level_cfgs=level_cfgs,
                preps=tuple(m[0] for m in merged),
                fxs=tuple(m[1] for m in merged),
                fys=tuple(m[2] for m in merged),
                ats=tuple(m[3] for m in merged),
            )
        )

    out_t = _out_t_enabled()

    def crop(acc, pk_):
        if out_t:  # kernel stored channels-major directly
            return acc[:, :, :, : pk_["qh"], : pk_["qw"]]
        return jnp.transpose(
            acc[:, :, : pk_["qh"], :, : pk_["qw"]], (0, 1, 3, 2, 4)
        )

    outs: List[jnp.ndarray] = [None] * len(spatial_shapes)
    for group in _qmerge_groups(
        len(spatial_shapes), [pk_["hp"] for pk_ in packs]
    ):
        if len(group) == 1:
            ai = group[0]
            pk_ = packs[ai]
            level_fn = _make_level_fn(
                (b, nh, rb, pk_["ha_pad"], p, d, pk_["wpad"], pk_["hp"],
                 interpret, pk_["level_cfgs"], out_t, _sparse_enabled(),
                 pk_["qw"])
            )
            acc = level_fn(pk_["preps"], pk_["fxs"], pk_["fys"], pk_["ats"])
            outs[ai] = crop(acc, pk_)
        else:
            gspecs = tuple(
                (rb, packs[ai]["ha_pad"], packs[ai]["wpad"],
                 packs[ai]["level_cfgs"], out_t)
                for ai in group
            )
            multi_fn = _make_multi_level_fn(
                (b, nh, rb, p, d, packs[group[0]]["hp"], interpret, gspecs)
            )
            accs = multi_fn(
                tuple(packs[ai]["preps"] for ai in group),
                tuple(packs[ai]["fxs"] for ai in group),
                tuple(packs[ai]["fys"] for ai in group),
                tuple(packs[ai]["ats"] for ai in group),
            )
            for gi, ai in enumerate(group):
                outs[ai] = crop(accs[gi], packs[ai])
    return outs


def windowed_ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    window=DEFAULT_WINDOW,  # int or per-VALUE-level tuple (mixed windows)
    interpret: bool = False,
    variant: str = "merged",
) -> jnp.ndarray:
    """Fused windowed deformable self-attention. Returns (B, S, H*D).

    Matches ``windowed_ms_deform_attn`` (and, whenever offsets stay inside
    the window — guaranteed by the module-level clamp — the exact gather
    op) to bf16 tolerance: values are multiplied in bf16, accumulated f32.

    ``variant`` selects the forward kernel structure (all numerically
    equivalent; measured on v5e at the flagship layer, batch 4):
    - 'cell': one launch per (query, value)-level pair, per-cell slab
      loads (21.0 ms/layer),
    - 'packed': 2 heads per grid step + column-outer tall-slab loads
      (18.5 ms/layer),
    - 'merged' (default): 'packed' plus all value levels of a query level fused
      into ONE launch — 3 launches per layer instead of 9, and the
      cross-level accumulator stays in registers.
    Falls back pair-wise ('cell') when the head count is odd.
    """
    b, s, nh, d = value.shape
    assert sampling_locations.shape[1] == s, "self-attention required"
    # Mosaic only lowers on real TPU; CPU (tests, driver dryruns) runs the
    # kernel in interpreter mode automatically
    interpret = interpret or jax.default_backend() == "cpu"
    nl = len(spatial_shapes)
    p = sampling_locations.shape[4]
    wins = _norm_windows(window, nl)
    out_dtype = value.dtype

    offsets = [0]
    for (h_l, w_l) in spatial_shapes:
        offsets.append(offsets[-1] + h_l * w_l)
    assert offsets[-1] == s

    import os

    # value images per level, built lazily per orientation:
    # normal (B, H, Hb, D, Wb) / transposed (B, H, Wb, D, Hb), bf16
    _vcache = {}

    def vimg(li, tr):
        key = (li, tr)
        if key not in _vcache:
            h_l, w_l = spatial_shapes[li]
            v = value[:, offsets[li] : offsets[li + 1]].reshape(
                b, h_l, w_l, nh, d
            )
            perm = (0, 3, 2, 4, 1) if tr else (0, 3, 1, 4, 2)
            _vcache[key] = jnp.transpose(v, perm).astype(jnp.bfloat16)
        return _vcache[key]

    out_levels: List[jnp.ndarray] = []
    for ai, (ha, wa) in enumerate(spatial_shapes):
        # row-block size MUST be a power of two: odd sizes (e.g. 5) hit a
        # ~1000x Mosaic retiling cliff (measured 11s vs 10ms per call).
        # DEFORM_RB is an experimentation knob (tools/check_pallas_tpu.py).
        rb = int(os.environ.get("DEFORM_RB", "4"))
        if rb < 1 or rb > 64 or (rb & (rb - 1)) != 0:
            raise ValueError(
                f"DEFORM_RB={rb}: row-block size must be a power of two "
                "in [1, 64] (odd sizes hit a ~1000x Mosaic retiling cliff)"
            )
        if variant == "merged" and nh % 2 == 0 and _out_t_enabled():
            # channels-major store puts HA on sublanes: the dynamic
            # row-block store offset must be provably 8-aligned on real
            # Mosaic (see windowed_ms_deform_attn_cm)
            rb = max(rb, 8)
        # orientation: put whichever spatial dim wastes fewer padded
        # cells on lanes. The stride-8 level of the flagship 800x1344
        # bucket is (100, 168): normal orientation pads lanes 168 -> 256
        # (52% waste in every weight tensor AND every kernel vector op);
        # transposed puts 100 on lanes (pad 128) and 168 on rows.
        # DEFORM_TRANSPOSE=0 forces normal orientation (A/B knob).
        tr = _round_up(wa, rb) * _round_up(ha, 128) < _round_up(
            ha, rb
        ) * _round_up(wa, 128)
        if os.environ.get("DEFORM_TRANSPOSE", "auto") == "0":
            tr = False
        qh, qw = (wa, ha) if tr else (ha, wa)
        ha_pad = _round_up(qh, rb)
        wpad = _round_up(qw, 128)
        # lane coordinate: x normally, y when transposed
        lane_i, row_i = (1, 0) if tr else (0, 1)

        locs_seg = sampling_locations[:, offsets[ai] : offsets[ai + 1]]
        wgts_seg = attention_weights[:, offsets[ai] : offsets[ai + 1]]
        use_merged = variant == "merged" and nh % 2 == 0
        if use_merged:
            # packed layout is built with ONE transpose per tensor (the
            # elementwise scale/clip fuses into it); the old
            # to_lanes+pack chain materialized each weight tensor 3x and
            # accounted for a large slice of the measured XLA-relayout
            # time (~48% of the op in the round-3 trace)
            hp = _heads_per_step(nh, ai)
            grp = nh // hp
            locs_r = locs_seg.reshape(b, ha, wa, grp, hp, nl, p, 2)
            wgts_r = wgts_seg.reshape(b, ha, wa, grp, hp, nl, p)
        else:
            # (B, H, qh, qw, P, ...) layouts (spatial dims in orientation)
            sperm = (0, 3, 2, 1) if tr else (0, 3, 1, 2)
            locs_a = jnp.transpose(
                locs_seg.reshape(b, ha, wa, nh, nl, p, 2),
                sperm + (4, 5, 6),
            )  # (B, H, qh, qw, L, P, 2)
            wgts_a = jnp.transpose(
                wgts_seg.reshape(b, ha, wa, nh, nl, p), sperm + (4, 5)
            )  # (B, H, qh, qw, L, P)

        acc = None
        merged: List = []  # (prep, fx, fy, at, mode, k, phase_rows, w)
        for bi, (hb, wb) in enumerate(spatial_shapes):
            w = wins[bi]  # per-value-level window
            # value level extents in the chosen orientation
            vh, vw = (wb, hb) if tr else (hb, wb)
            ax = jnp.asarray(_anchor(qw, vw, w), jnp.float32)  # lane anchor
            ay = jnp.asarray(_anchor(qh, vh, w), jnp.float32)  # row anchor
            prep, mode, k, phase_rows = _prep_value_pair(
                vimg(bi, tr), qh, qw, vh, vw, w, wpad, rb, ha_pad,
                compact=use_merged,
            )
            rows_v, cols_v = prep.shape[2], prep.shape[4]

            if use_merged:
                # (B, Ha, Wa, G, hp, P); dim1 = y, dim2 = x always — the
                # orientation only decides which one lands on lanes
                px = locs_r[..., bi, :, lane_i].astype(jnp.float32) * vw - 0.5
                py = locs_r[..., bi, :, row_i].astype(jnp.float32) * vh - 0.5
                if tr:
                    fx = jnp.clip(
                        px - ax[None, :, None, None, None, None], 0, w - 1
                    )
                    fy = jnp.clip(
                        py - ay[None, None, :, None, None, None], 0, w - 1
                    )
                else:
                    fx = jnp.clip(
                        px - ax[None, None, :, None, None, None], 0, w - 1
                    )
                    fy = jnp.clip(
                        py - ay[None, :, None, None, None, None], 0, w - 1
                    )
                at = wgts_r[..., bi, :]

                def pk(x, dt):
                    perm = (0, 3, 2, 4, 5, 1) if tr else (0, 3, 1, 4, 5, 2)
                    x = jnp.transpose(x, perm)
                    # (B, G, qh, hp, P, qw) -> packed sublanes + lane pad
                    x = x.reshape(b, grp, qh, hp * p, qw).astype(dt)
                    return jnp.pad(
                        x,
                        (
                            (0, 0),
                            (0, 0),
                            (0, ha_pad - qh),
                            (0, 0),
                            (0, wpad - qw),
                        ),
                    )

                merged.append(
                    (
                        prep,
                        pk(fx, jnp.float32),
                        pk(fy, jnp.float32),
                        pk(at, jnp.bfloat16),
                        mode,
                        k,
                        phase_rows,
                        w,
                    )
                )
                continue

            px = locs_a[..., bi, :, lane_i].astype(jnp.float32) * vw - 0.5
            py = locs_a[..., bi, :, row_i].astype(jnp.float32) * vh - 0.5
            fx = jnp.clip(px - ax[None, None, None, :, None], 0, w - 1)
            fy = jnp.clip(py - ay[None, None, :, None, None], 0, w - 1)
            at = wgts_a[..., bi, :]

            # to kernel layout (B, H, ha_pad, P, WPAD); padded region gets
            # attn=0 so it contributes nothing
            def to_lanes(x, fill):
                x = jnp.transpose(x, (0, 1, 2, 4, 3))  # (B,H,qh,P,qw)
                return jnp.pad(
                    x,
                    (
                        (0, 0),
                        (0, 0),
                        (0, ha_pad - qh),
                        (0, 0),
                        (0, wpad - qw),
                    ),
                    constant_values=fill,
                )

            fx_k = to_lanes(fx, 0.0)
            fy_k = to_lanes(fy, 0.0)
            at_k = to_lanes(at, 0.0).astype(jnp.bfloat16)

            hp = 2 if (variant != "cell" and nh % 2 == 0) else 1
            pair_fn = _make_pair_fn(
                (b, nh, w, rb, ha_pad, p, d, wpad, mode, k, phase_rows,
                 rows_v, cols_v, interpret,
                 "packed" if hp > 1 else "cell", hp)
            )
            part = pair_fn(prep, fx_k, fy_k, at_k)
            acc = part.astype(jnp.float32) if acc is None else acc + part

        out_t = False
        if merged:
            level_cfgs = tuple(
                (m[4], m[5], m[6], m[0].shape[2], m[0].shape[4], m[7])
                for m in merged
            )
            out_t = _out_t_enabled()
            level_fn = _make_level_fn(
                (b, nh, rb, ha_pad, p, d, wpad, hp, interpret,
                 level_cfgs, out_t, _sparse_enabled(), qw)
            )
            acc = level_fn(
                tuple(m[0] for m in merged),
                tuple(m[1] for m in merged),
                tuple(m[2] for m in merged),
                tuple(m[3] for m in merged),
            ).astype(jnp.float32)

        # -> (B, Ha*Wa, H*D)
        if out_t:  # (B, H, D, qh, qw)
            out = acc[:, :, :, :qh, :qw]
            perm = (0, 4, 3, 1, 2) if tr else (0, 3, 4, 1, 2)
        else:  # (B, H, qh, D, qw)
            out = acc[:, :, :qh, :, :qw]
            perm = (0, 4, 2, 1, 3) if tr else (0, 2, 4, 1, 3)
        out = jnp.transpose(out, perm).reshape(b, ha * wa, nh * d)
        out_levels.append(out)

    return jnp.concatenate(out_levels, axis=1).astype(out_dtype)
