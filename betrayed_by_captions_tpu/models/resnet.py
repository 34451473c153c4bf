"""ResNet backbone (torch 'pytorch'-style bottleneck, frozen-BN, NHWC).

TPU-native equivalent of the reference backbone (mmdet ResNet depth=50,
out_indices (0,1,2,3), frozen_stages=3, BN frozen;
configs/instance/coco_b48n17.py:18-27). Design differences from the torch
original, chosen for TPU:

- NHWC layout throughout (XLA's preferred conv layout),
- frozen BN folded into a fused multiply-add (no batch stats ever),
- params are fp32, compute dtype configurable (bf16 on TPU),
- "frozen_stages" is enforced by the optimizer mask
  (engine/optim.py), not by module state.

Checkpoint porting from torchvision/mmdet state dicts transposes conv
kernels OIHW→HWIO (engine/porting.py).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import FrozenBatchNorm

Dtype = Any

_STAGE_BLOCKS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) bottleneck, 'pytorch' style (stride on
    the 3x3 conv)."""

    mid_features: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_features = self.mid_features * 4
        identity = x
        y = nn.Conv(
            self.mid_features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        y = FrozenBatchNorm(self.mid_features, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.mid_features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = FrozenBatchNorm(self.mid_features, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            out_features, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = FrozenBatchNorm(out_features, dtype=self.dtype, name="bn3")(y)
        if self.has_downsample:
            identity = nn.Conv(
                out_features,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(
                out_features, dtype=self.dtype, name="downsample_bn"
            )(identity)
        return nn.relu(y + identity)


class StemConv(nn.Module):
    """The 7x7/2 stem conv, optionally run space-to-depth.

    With ``space_to_depth`` (default), the conv is computed as an EXACTLY
    equivalent 4x4/1 conv over a 2x2-packed input (the MLPerf-style
    trick): 3-channel convs starve the MXU, and the direct stem plus its
    input-relayout copy was ~31% of backbone time (round-3 trace). The
    parameter keeps the torch (7, 7, 3, 64) HWIO shape at the same tree
    path (``stem_conv/kernel``), so checkpoint porting is unchanged; the
    packed kernel is a trace-time rearrangement of the same weights
    (output kx = 2a + dy - 1 index mapping — derived in
    tests/test_models.py::TestResNet::test_s2d_stem_exact).
    """

    space_to_depth: bool = True
    features: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 3, self.features),
            jnp.float32,
        )
        n, hh, ww, _ = x.shape
        dn = ("NHWC", "HWIO", "NHWC")
        if not (self.space_to_depth and hh % 2 == 0 and ww % 2 == 0):
            return jax.lax.conv_general_dilated(
                x,
                w.astype(self.dtype),
                (2, 2),
                [(3, 3), (3, 3)],
                dimension_numbers=dn,
            )
        # pack 2x2 pixels into channels: (N, H/2, W/2, (dy, dx, c))
        xp = x.reshape(n, hh // 2, 2, ww // 2, 2, 3)
        xp = jnp.transpose(xp, (0, 1, 3, 2, 4, 5)).reshape(
            n, hh // 2, ww // 2, 12
        )
        # W4[a, b, (dy, dx, c), o] = W[2a + dy - 1, 2b + dx - 1, c, o]
        # (out-of-range taps are zero: pad one leading row/col)
        wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w4 = jnp.transpose(
            wp.reshape(4, 2, 4, 2, 3, self.features), (0, 2, 1, 3, 4, 5)
        ).reshape(4, 4, 12, self.features)
        return jax.lax.conv_general_dilated(
            xp,
            w4.astype(self.dtype),
            (1, 1),
            [(2, 1), (2, 1)],
            dimension_numbers=dn,
        )


class ResNet(nn.Module):
    """ResNet-50/101 returning the four stage outputs (C2..C5, NHWC).

    ``frozen_stages`` follows the mmdet convention (reference
    configs/instance/coco_b48n17.py:23): -1 trains everything, 0 freezes
    the stem, N freezes stem + layer1..layerN. Frozen parts are wrapped
    in ``stop_gradient`` so XLA neither saves their activations nor runs
    their backward — the optimizer mask (engine/optim.py) alone keeps
    the params fixed but still pays the full backbone backward (batch-8
    1024^2 training OOMs by ~1.3 GB without this)."""

    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    space_to_depth_stem: bool = True
    frozen_stages: int = -1
    # mmdet ResNet's base_channels: stage widths scale with it (mid =
    # base * 2^stage, out = mid * 4). Non-default values are for small
    # test/dryrun models; reference checkpoints require 64.
    base_channels: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        blocks = _STAGE_BLOCKS[self.depth]
        x = x.astype(self.dtype)
        x = StemConv(
            space_to_depth=self.space_to_depth_stem,
            features=self.base_channels,
            dtype=self.dtype,
            name="stem_conv",
        )(x)
        x = FrozenBatchNorm(
            self.base_channels, dtype=self.dtype, name="stem_bn"
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        mid = self.base_channels
        for stage_idx, num_blocks in enumerate(blocks):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(num_blocks):
                x = Bottleneck(
                    mid_features=mid,
                    stride=stride if block_idx == 0 else 1,
                    has_downsample=(block_idx == 0),
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_block{block_idx}",
                )(x)
            if stage_idx + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage_idx in self.out_indices:
                outs.append(x)
            mid *= 2
        return tuple(outs)
