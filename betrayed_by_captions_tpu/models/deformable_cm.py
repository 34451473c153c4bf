"""Channels-major deformable encoder (TPU production layout).

The round-4 device trace of the token-layout encoder showed ~30 ms/layer
(batch 16) of XLA relayouts around 24 ms of Pallas kernels: every layer
re-derived image-layout value/weight tensors (spatial lane dim) from
token-layout ``(B, S, C)`` activations (feature lane dim), paying full
lane transposes for each of value, offsets, attention weights and the
output. This module flips the RESIDENT layout instead: the encoder's
activations are per-level channels-major images ``(B, C, eh, ew)`` whose
lane dim is the level's kernel-preferred spatial dim, so

- Dense projections contract over the leading channel dim (the MXU
  handles transposed operands natively),
- packing projections into kernel layout is a sublane-level permute
  (lanes unchanged),
- LayerNorm/FFN/residual are layout-agnostic elementwise/contraction ops.

``(eh, ew)`` is ``(h, w)`` or ``(w, h)`` per level, chosen by the same
lane-padding-waste rule as the kernel (the flagship stride-8 level of the
800x1344 bucket stores transposed: 100 lanes instead of 168->256).

Parameter trees are IDENTICAL to the token-layout modules (same names,
same (in, out) kernel shapes), so checkpoints are interchangeable between
``attn_impl`` paths and reference-checkpoint porting is unchanged.

Equivalent reference component: mmcv MultiScaleDeformableAttention +
mmdet encoder layers (configs/instance/coco_b48n17.py:48-58); numerical
behavior matches models/deformable.py with ``attn_impl="windowed_pallas"``
(tests/test_deform_cm.py).
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deform_attn_windowed_pallas import (
    _round_up,
    windowed_ms_deform_attn_pallas_cm,
)
from .deformable import _compass_offset_init, window_per_level

Dtype = Any


def choose_orientations(
    spatial_shapes: Sequence[Tuple[int, int]], rb: int = 4
) -> Tuple[bool, ...]:
    """Per level: store transposed when that wastes fewer padded lanes
    (mirrors the kernel's orientation rule)."""
    out = []
    for (h, w) in spatial_shapes:
        out.append(
            _round_up(w, rb) * _round_up(h, 128)
            < _round_up(h, rb) * _round_up(w, 128)
        )
    return tuple(out)


class DenseCM(nn.Module):
    """nn.Dense applied over the leading channel dim of (B, C, *spatial).

    Identical param tree to nn.Dense (kernel (in, out), bias (out,));
    ``y[b, f, ...] = sum_c x[b, c, ...] K[c, f] + b[f]``.
    """

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[1]
        kernel = self.param(
            "kernel", self.kernel_init, (in_features, self.features)
        )
        bias = self.param("bias", self.bias_init, (self.features,))
        y = jnp.einsum(
            "bc...,cf->bf...", x, kernel.astype(self.dtype)
        )
        return y + bias.astype(y.dtype).reshape(
            (1, -1) + (1,) * (y.ndim - 2)
        )


class _LNCore(nn.Module):
    """Param holder matching nn.LayerNorm's tree ({scale, bias})."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        shape = (1, -1) + (1,) * (x.ndim - 2)
        return x * scale.reshape(shape) + bias.reshape(shape)


class _ProjParams(nn.Module):
    """Bare (kernel, bias) holder with DenseCM's exact param tree — used
    where the projection math is written out manually (fused multi-head
    kernels, custom output orders) but checkpoints must stay
    interchangeable with the token-layout modules."""

    in_features: int
    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel", self.kernel_init, (self.in_features, self.features)
        )
        bias = self.param("bias", self.bias_init, (self.features,))
        return kernel, bias


def _ln_pallas_enabled() -> bool:
    """DEFORM_LN=0 reverts to the XLA moment chain (A/B knob, read at
    trace time)."""
    import os

    return os.environ.get("DEFORM_LN", "1") != "0"


class _LNParams(nn.Module):
    """Param holder matching _LNCore's tree ({scale, bias}) for paths
    that consume the params directly (the fused Pallas LayerNorm)."""

    features: int

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class LayerNormF32CM(nn.Module):
    """LayerNormF32 over the channel dim of (B, C, *spatial).

    Default path: ONE fused Pallas pass (ops/layernorm_pallas.py) —
    read each (C, rows, lanes) block once, both f32 moments per
    (row, lane), normalize + affine, write. The XLA fallback
    (DEFORM_LN=0) computes both moments in one multi-output reduce
    (var = E[x^2] - E[x]^2) but still lowers as ~3 passes in the
    encoder's channels-major layout — 16.6 ms/iter across the encoder's
    12 LN applications vs a ~4 ms memory floor (PERF.md round 10)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if _ln_pallas_enabled() and x.ndim == 4:
            from ..ops.layernorm_pallas import layernorm_cm

            scale, bias = _LNParams(features=x.shape[1], name="ln")()
            return layernorm_cm(x, scale, bias, self.eps)
        orig = x.dtype
        y = x.astype(jnp.float32)
        mean = y.mean(axis=1, keepdims=True)
        msq = jax.lax.square(y).mean(axis=1, keepdims=True)
        var = jnp.maximum(msq - jax.lax.square(mean), 0.0)
        y = (y - mean) * jax.lax.rsqrt(var + self.eps)
        y = _LNCore(features=x.shape[1], name="ln")(y)
        return y.astype(orig)


class FFNCM(nn.Module):
    """FFN (Linear-ReLU-Linear + residual) over the channel dim."""

    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = DenseCM(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        y = nn.relu(y)
        y = DenseCM(self.out_features, dtype=self.dtype, name="fc2")(y)
        return x + y


def make_reference_points_cm(
    spatial_shapes: Sequence[Tuple[int, int]],
    orientations: Sequence[bool],
) -> List[np.ndarray]:
    """Per level (2, eh, ew) planes of normalized (x, y) grid centers in
    the stored orientation (channel 0 = x, 1 = y)."""
    out = []
    for (h, w), tr in zip(spatial_shapes, orientations):
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")  # (h, w)
        ref = np.stack([gx, gy], axis=0)  # (2, h, w)
        if tr:
            ref = np.transpose(ref, (0, 2, 1))  # (2, w, h)
        out.append(ref)
    return out


class MSDeformAttentionCM(nn.Module):
    """Channels-major multi-scale deformable self-attention.

    Input/output: per-level lists of (B, C, eh, ew). Param tree matches
    models/deformable.MSDeformAttention exactly.
    """

    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    window: Any = 8  # int or per-value-level tuple, e.g. (8, 6, 4)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        queries: Sequence[jnp.ndarray],  # per level; raw tokens when
        # ``pos`` is given (the positional term folds into the
        # offsets/attention projection epilogue), else tokens + pos
        tokens: Sequence[jnp.ndarray],  # raw tokens, per level
        reference_points: Sequence[jnp.ndarray],  # per level (2, eh, ew)
        spatial_shapes: Sequence[Tuple[int, int]],
        orientations: Sequence[bool],
        pos: Sequence[jnp.ndarray] = None,  # per level (1, C, eh, ew)
    ) -> List[jnp.ndarray]:
        nh, nl, npts = self.num_heads, self.num_levels, self.num_points
        d = self.embed_dim // nh
        assert self.window is not None, (
            "channels-major path is always windowed"
        )
        wins = window_per_level(self.window, nl)
        w = int(max(wins))  # dense kernel window; per-level clamps below
        dt = self.dtype

        kv, bv = _ProjParams(self.embed_dim, self.embed_dim,
                             name="value_proj")()
        ko, bo = _ProjParams(
            self.embed_dim, nh * nl * npts * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_compass_offset_init(
                nh, nl, npts,
                max_offset=tuple(wl / 2 - 1 for wl in wins),
            ),
            name="sampling_offsets",
        )()
        ka, ba = _ProjParams(
            self.embed_dim, nh * nl * npts,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )()
        output_proj = DenseCM(
            self.embed_dim, dtype=self.dtype, name="output_proj"
        )
        # offsets + attention share the query input: ONE fused matmul
        # (256 -> 288) instead of two narrow ones — the round-3 trace put
        # the two small-output projections at ~8% MFU each (MXU wants
        # wide output tiles), plus a second full read of the queries
        n_off = nh * nl * npts * 2
        koa = jnp.concatenate([ko, ka], axis=1).astype(dt)
        boa = jnp.concatenate([bo, ba], axis=0)

        values, offsets, attention = [], [], []
        for li in range(nl):
            b = tokens[li].shape[0]
            eh, ew = tokens[li].shape[2:]
            # value projection STRAIGHT into kernel layout
            # (B, NH, rows=eh, D, lanes=ew): the (nh, d) split and the
            # eh<->d sublane swap ride the matmul's output write instead
            # of a separate 0.9 ms/layer relayout copy (round-3 trace,
            # deformable_cm.py:209)
            v = jnp.einsum(
                "bchw,cnd->bnhdw",
                tokens[li],
                kv.astype(dt).reshape(self.embed_dim, nh, d),
            )
            v = v + bv.astype(v.dtype).reshape(1, nh, 1, d, 1)
            values.append(v.astype(jnp.bfloat16))

            oa = jnp.einsum("bchw,ce->behw", queries[li], koa)
            oa = oa + boa.astype(oa.dtype).reshape(1, -1, 1, 1)
            if pos is not None:
                # positional term folded into the projection epilogue:
                # pos is batch-constant, so pos @ K is a small (E, eh, ew)
                # plane and the (tokens + pos) materialization (a full
                # 2-pass read/write of the activations per layer,
                # ~7 ms/iter in the round-3 trace) never happens
                oa = oa + jnp.einsum(
                    "bchw,ce->behw", pos[li].astype(dt), koa
                )

            # window clamp (see models/deformable.py docstring); kept in
            # CELL units — the op folds reference scaling, anchors and
            # the final window clip into its packed-plane write, so the
            # normalized-locations tensor never materializes. bf16
            # storage: learned offsets at 0.4% relative error, below the
            # op's int16 plane quantization noise floor. The clip runs in
            # the projection dtype directly (the bounds are exact in
            # bf16) — the old f32 round-trip materialized an extra f32
            # copy of the offsets every layer.
            offs = oa[:, :n_off].reshape(b, nh, nl, npts, 2, eh, ew)
            # per-value-level clamp: with mixed windows (e.g. (8, 6, 4))
            # offsets for level l never leave W_l, so the dense
            # max-window kernel is numerically identical to a true
            # mixed-window kernel (outer cells get zero tent weight)
            clamp = jnp.asarray(
                [wl / 2 - 1 for wl in wins], offs.dtype
            ).reshape(1, 1, nl, 1, 1, 1, 1)
            offs = jnp.clip(offs, -clamp, clamp)
            offsets.append(offs.astype(jnp.bfloat16))

            at = oa[:, n_off:].reshape(b, nh, nl * npts, eh, ew)
            at = nn.softmax(at.astype(jnp.float32), axis=2)
            attention.append(
                at.reshape(b, nh, nl, npts, eh, ew).astype(self.dtype)
            )

        outs = windowed_ms_deform_attn_pallas_cm(
            values,
            spatial_shapes,
            orientations,
            offsets,
            reference_points,
            attention,
            window=tuple(int(x) for x in wins),
        )
        results = []
        for li, o in enumerate(outs):
            # channels-major (B, NH, D, eh, ew) from the kernel: the
            # merge to (B, NH*D, eh, ew) is a pure reshape (the kernel
            # stores this layout directly under DEFORM_OUT_T)
            b = o.shape[0]
            eh, ew = o.shape[3], o.shape[4]
            o = o.reshape(b, nh * d, eh, ew)
            results.append(output_proj(o.astype(self.dtype)))
        return results


class EncoderLayerCM(nn.Module):
    """One channels-major deformable encoder layer (param tree matches
    pixel_decoder.EncoderLayer). ``__call__`` takes/returns per-level
    tuples of (B, C, eh, ew)."""

    spatial_shapes: Tuple[Tuple[int, int], ...]
    orientations: Tuple[bool, ...]
    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    ffn_dim: int = 1024
    window: Any = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, pos, reference_points):
        # pos folds into the offsets/attention projection inside the attn
        # module (queries = tokens + pos never materializes)
        attn_out = MSDeformAttentionCM(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            num_levels=self.num_levels,
            num_points=self.num_points,
            window=self.window,
            dtype=self.dtype,
            name="attn",
        )(
            tokens,
            tokens,
            reference_points,
            self.spatial_shapes,
            self.orientations,
            pos=pos,
        )
        norm1 = LayerNormF32CM(name="norm1")
        ffn = FFNCM(self.ffn_dim, self.embed_dim, dtype=self.dtype, name="ffn")
        norm2 = LayerNormF32CM(name="norm2")
        out = []
        for t, a in zip(tokens, attn_out):
            y = norm1(t + a)
            y = ffn(y)
            out.append(norm2(y))
        return tuple(out)
