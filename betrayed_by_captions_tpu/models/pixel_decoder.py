"""Pixel decoder: 6-layer deformable encoder + FPN fuse to stride 4.

TPU-native equivalent of mmdet's ``MSDeformAttnPixelDecoder`` (reference
config /root/reference/configs/instance/coco_b48n17.py:37-70; consumed at
open_set/models/mask2former_head.py:787). Behavior contract:

- inputs: backbone features C2..C5 (NHWC, strides 4/8/16/32),
- 1x1 ConvGN projections on C3..C5, tokens flattened and concatenated
  (level order: stride 32, 16, 8 — low to high resolution),
- 6 encoder layers: deformable self-attn (+level & sine pos enc on the
  queries) -> LN -> FFN(1024) -> LN (post-norm),
- encoder output split back to maps; C2 lateral 1x1 ConvGN + bilinear
  upsample of the stride-8 map, fused by a 3x3 ConvGN+ReLU,
- ``mask_features``: 3x3 conv (no norm/act) on the stride-4 map,
- returns (mask_features, [stride32, stride16, stride8] maps).

Static shapes: level (h, w) are Python ints at trace time.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.positional import sine_positional_encoding_2d
from ..ops.resize import bilinear_resize
from .common import FFN, ConvGN, LayerNormF32
from .deformable import MSDeformAttention, make_reference_points

Dtype = Any


class EncoderLayer(nn.Module):
    """One deformable encoder layer. ``spatial_shapes`` is a static
    module field (tuple of (h, w)) so the layer's ``__call__`` takes only
    arrays — required for ``nn.remat`` wrapping."""

    spatial_shapes: Tuple[Tuple[int, int], ...]
    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    ffn_dim: int = 1024
    attn_impl: str = "exact"
    window: int | None = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, pos, reference_points):
        attn_out = MSDeformAttention(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            num_levels=self.num_levels,
            num_points=self.num_points,
            attn_impl=self.attn_impl,
            window=self.window,
            dtype=self.dtype,
            name="attn",
        )(tokens + pos, tokens, reference_points, self.spatial_shapes)
        tokens = LayerNormF32(name="norm1")(tokens + attn_out)
        tokens = FFN(self.ffn_dim, self.embed_dim, dtype=self.dtype, name="ffn")(tokens)
        tokens = LayerNormF32(name="norm2")(tokens)
        return tokens


class MSDeformAttnPixelDecoder(nn.Module):
    feat_channels: int = 256
    out_channels: int = 256
    num_encoder_layers: int = 6
    num_encoder_levels: int = 3
    num_heads: int = 8
    num_points: int = 4
    ffn_dim: int = 1024
    attn_impl: str = "exact"
    window: int | None = 8
    # rematerialize encoder layers in the backward pass (jax.checkpoint):
    # trades ~1 extra forward of each layer for not storing its
    # activations — the 6-layer encoder over ~21.5k tokens dominates
    # training HBM (batch-8 1024^2 training OOMs without it)
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray]
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """feats: [C2, C3, C4, C5] NHWC. Returns (mask_features, memories)."""
        assert len(feats) == 4
        b = feats[0].shape[0]
        c = self.feat_channels

        # encoder levels, from lowest resolution (C5) to highest (C3)
        enc_feats = [feats[3], feats[2], feats[1]]
        spatial_shapes = [(f.shape[1], f.shape[2]) for f in enc_feats]

        level_embed = self.param(
            "level_embed",
            nn.initializers.normal(1.0),
            (self.num_encoder_levels, c),
        )

        projs = [
            ConvGN(c, 1, dtype=self.dtype, name=f"input_conv{i}")(f)
            for i, f in enumerate(enc_feats)
        ]

        use_cm = (
            self.attn_impl == "windowed_pallas"
            and self.window is not None
            and self.num_heads % 2 == 0
        )
        if use_cm:
            # channels-major encoder (see models/deformable_cm.py): the
            # resident layout keeps each level's kernel-preferred spatial
            # dim on lanes; entry/exit pay ONE lane transpose per level
            # instead of per-layer relayouts of value/weights/output
            from .deformable_cm import (
                EncoderLayerCM,
                choose_orientations,
                make_reference_points_cm,
            )

            orientations = choose_orientations(spatial_shapes)
            cm_tokens, pos_cm = [], []
            for i, proj in enumerate(projs):
                h, w = spatial_shapes[i]
                perm = (0, 3, 2, 1) if orientations[i] else (0, 3, 1, 2)
                cm_tokens.append(jnp.transpose(proj, perm))
                pos = sine_positional_encoding_2d(h, w, c // 2)  # (C,h,w)
                pos = pos + level_embed[i][:, None, None]
                if orientations[i]:
                    pos = jnp.transpose(pos, (0, 2, 1))
                pos_cm.append(pos[None].astype(self.dtype))
            refs = [
                jnp.asarray(r)
                for r in make_reference_points_cm(
                    spatial_shapes, orientations
                )
            ]
            cm_tokens = tuple(cm_tokens)
            layer_cls = (
                nn.remat(EncoderLayerCM) if self.remat else EncoderLayerCM
            )
            for li in range(self.num_encoder_layers):
                cm_tokens = layer_cls(
                    spatial_shapes=tuple(tuple(s) for s in spatial_shapes),
                    orientations=orientations,
                    embed_dim=c,
                    num_heads=self.num_heads,
                    num_levels=self.num_encoder_levels,
                    num_points=self.num_points,
                    ffn_dim=self.ffn_dim,
                    window=self.window,
                    dtype=self.dtype,
                    name=f"encoder_layer{li}",
                )(cm_tokens, tuple(pos_cm), tuple(refs))
            memories = []
            for i, t in enumerate(cm_tokens):
                perm = (0, 3, 2, 1) if orientations[i] else (0, 2, 3, 1)
                memories.append(jnp.transpose(t, perm))
        else:
            tokens, pos_list = [], []
            for i, proj in enumerate(projs):
                h, w = spatial_shapes[i]
                tokens.append(proj.reshape(b, h * w, c))
                pos = sine_positional_encoding_2d(h, w, c // 2)  # (C,h,w)
                pos = pos.reshape(c, h * w).T  # (h*w, C)
                pos_list.append(
                    (pos + level_embed[i][None, :]).astype(self.dtype)
                )
            tokens = jnp.concatenate(tokens, axis=1)  # (B, S, C)
            pos = jnp.concatenate(pos_list, axis=0)[None]  # (1, S, C)

            reference_points = jnp.asarray(
                make_reference_points(spatial_shapes)
            )

            layer_cls = nn.remat(EncoderLayer) if self.remat else EncoderLayer
            for li in range(self.num_encoder_layers):
                tokens = layer_cls(
                    spatial_shapes=tuple(tuple(s) for s in spatial_shapes),
                    embed_dim=c,
                    num_heads=self.num_heads,
                    num_levels=self.num_encoder_levels,
                    num_points=self.num_points,
                    ffn_dim=self.ffn_dim,
                    attn_impl=self.attn_impl,
                    window=self.window,
                    dtype=self.dtype,
                    name=f"encoder_layer{li}",
                )(tokens, pos, reference_points)

            # split back to per-level maps (low->high resolution)
            memories = []
            offset = 0
            for (h, w) in spatial_shapes:
                memories.append(
                    tokens[:, offset : offset + h * w].reshape(b, h, w, c)
                )
                offset += h * w

        # FPN: fuse C2 with upsampled stride-8 memory
        lateral = ConvGN(c, 1, dtype=self.dtype, name="lateral_conv0")(feats[0])
        top = memories[-1]  # stride 8
        top_up = bilinear_resize(
            jnp.transpose(top, (0, 3, 1, 2)), lateral.shape[1], lateral.shape[2]
        )
        top_up = jnp.transpose(top_up, (0, 2, 3, 1)).astype(lateral.dtype)
        y = lateral + top_up
        y = ConvGN(c, 3, use_relu=True, dtype=self.dtype, name="output_conv0")(y)

        mask_features = nn.Conv(
            self.out_channels,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            dtype=self.dtype,
            name="mask_feature_conv",
        )(y)
        return mask_features, memories
