"""Shared building blocks: frozen BN, group-norm conv blocks, MLPs.

These are the TPU-native (flax.linen, NHWC, bf16-capable) stand-ins for the
mmcv ``ConvModule``/norm bricks used throughout the reference model
(SURVEY.md §2b). Parameters are fp32; compute can be cast via ``dtype``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """BatchNorm with permanently frozen statistics and affine params.

    Equivalent to the reference backbone's ``norm_eval=True`` +
    ``requires_grad=False`` BN (configs/instance/coco_b48n17.py:23-25):
    always a per-channel affine transform using stored running stats.
    The four arrays live in params so torch checkpoints port 1:1; the
    optimizer masks them out (engine/optim.py labels them 'frozen').
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        # fold stats into a single multiply-add (XLA fuses into the conv)
        inv = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        b = (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * inv + b


class ConvGN(nn.Module):
    """Conv + GroupNorm(+ReLU) block (mmcv ConvModule with GN norm_cfg).

    Matches the pixel decoder's input/lateral/output convs
    (configs/instance/coco_b48n17.py:40: norm_cfg GN num_groups=32).
    """

    features: int
    kernel_size: int = 1
    num_groups: int = 32
    use_relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding=[(pad, pad), (pad, pad)],
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.GroupNorm(
            num_groups=self.num_groups, epsilon=1e-5, dtype=jnp.float32, name="gn"
        )(x.astype(jnp.float32)).astype(self.dtype)
        if self.use_relu:
            x = nn.relu(x)
        return x


class MLP(nn.Module):
    """Stack of Dense layers with ReLU between (e.g. the 3-layer mask_embed,
    reference open_set/models/mask2former_head.py:141-144)."""

    hidden_features: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.hidden_features)
        for i, feats in enumerate(self.hidden_features):
            x = nn.Dense(feats, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < n - 1:
                x = nn.relu(x)
        return x


class FFN(nn.Module):
    """Transformer feed-forward block with residual (mmcv FFN semantics:
    Linear→ReLU→Linear, add identity)."""

    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(y)
        return x + y


class LayerNormF32(nn.Module):
    """LayerNorm computed in fp32 regardless of compute dtype."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig = x.dtype
        y = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32, name="ln")(
            x.astype(jnp.float32)
        )
        return y.astype(orig)
