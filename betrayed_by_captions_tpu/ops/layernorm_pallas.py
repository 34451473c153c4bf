"""Fused channels-major LayerNorm for TPU (single pass over HBM).

``LayerNormF32CM`` (models/deformable_cm.py) normalizes over the channel
dim of (B, C, eh, ew) activations. XLA lowers the moment chain as three
separate passes in the encoder's resident layout — the round-4 W=8
pixel-decoder trace (PERF.md round 10) shows the 12 encoder LN
applications at 16.6 ms/iter against a ~4 ms memory-bound floor. This
kernel reads each (C, rows, ew) block once from VMEM, computes both
f32 moments per (row, lane), and writes the normalized+affine output —
one HBM read + one write total.

Moments are per (batch, row, lane) over C only, so row-block padding at
array edges cannot cross-contaminate (padded rows produce garbage that
the masked store drops).

Backward: custom VJP whose backward differentiates the pure-XLA
reference formula (one extra fused recompute — LN is a tiny share of a
training step; inference never pays it).

Reference counterpart: torch nn.LayerNorm inside mmcv's
ms_deform_attn encoder layers (/root/reference/open_set/models — via
mmdet Mask2Former config norm_cfg), which runs in cuDNN as one kernel.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)  # (C, rt, ew)
    mean = jnp.mean(x, axis=0, keepdims=True)
    msq = jnp.mean(jax.lax.square(x), axis=0, keepdims=True)
    var = jnp.maximum(msq - jax.lax.square(mean), 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    # params arrive pre-shaped (C, 1, 1): an in-kernel reshape of a
    # (C,)-lane vector to (C, 1, 1) moves the lane dim outermost — a
    # relayout real Mosaic rejects (interpret mode can't see it)
    y = y * s_ref[0] + b_ref[0]
    o_ref[0] = y.astype(o_ref.dtype)


def _param_spec(c):
    return pl.BlockSpec(
        (1, c, 1, 1), lambda bb, ii: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )


def _ln_reference(x, scale, bias, eps):
    y = x.astype(jnp.float32)
    mean = y.mean(axis=1, keepdims=True)
    msq = jax.lax.square(y).mean(axis=1, keepdims=True)
    var = jnp.maximum(msq - jax.lax.square(mean), 0.0)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    y = y * scale.reshape(shape).astype(jnp.float32) + bias.reshape(
        shape
    ).astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layernorm_cm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over dim 1 of (B, C, eh, ew); f32 moments, affine in
    f32, output in x.dtype. Pallas on TPU, interpret elsewhere."""
    return _ln_fwd_impl(x, scale, bias, eps)


def _ln_fwd_impl(x, scale, bias, eps):
    b, c, eh, ew = x.shape
    interpret = jax.default_backend() == "cpu"
    rt = min(8, eh)
    grid = (b, pl.cdiv(eh, rt))
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, c, rt, ew), lambda bb, ii: (bb, 0, ii, 0),
                memory_space=pltpu.VMEM,
            ),
            _param_spec(c),
            _param_spec(c),
        ],
        out_specs=pl.BlockSpec(
            (1, c, rt, ew), lambda bb, ii: (bb, 0, ii, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale.reshape(1, c, 1, 1), bias.reshape(1, c, 1, 1))


def _ln_fwd(x, scale, bias, eps):
    return _ln_fwd_impl(x, scale, bias, eps), (x, scale, bias)


def _ln_bwd(eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda a, s, b: _ln_reference(a, s, b, eps), x, scale,
                     bias)
    return vjp(g)


layernorm_cm.defvjp(_ln_fwd, _ln_bwd)
