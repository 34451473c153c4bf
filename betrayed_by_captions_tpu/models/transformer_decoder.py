"""DETR-style transformer decoder layer for the Mask2Former query decoder.

TPU-native equivalent of mmcv's ``DetrTransformerDecoderLayer`` with
operation order (cross_attn, norm, self_attn, norm, ffn, norm) and
post-norm, as configured at
/root/reference/configs/instance/coco_b48n17.py:74-99 (9 layers, embed 256,
8 heads, FFN 2048). The masked cross-attention consumes the per-layer
boolean attention mask produced by the head (True = pixel blocked for that
query; reference open_set/models/mask2former_head.py:749-759,825-840).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .attention import MultiHeadAttention
from .common import FFN, LayerNormF32

Dtype = Any


class DetrDecoderLayer(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C)
        key: jnp.ndarray,  # (B, N, C) pixel tokens of the current level
        query_pos: jnp.ndarray,  # (B, Q, C)
        key_pos: jnp.ndarray,  # (B or 1, N, C)
        cross_attn_mask: Optional[jnp.ndarray] = None,  # (B, H, Q, N) bool
    ) -> jnp.ndarray:
        # masked cross-attention first (Mask2Former ordering)
        attn_out = MultiHeadAttention(
            self.embed_dim, self.num_heads, dtype=self.dtype, name="cross_attn"
        )(
            query,
            key,
            key,
            query_pos=query_pos,
            key_pos=jnp.broadcast_to(key_pos, key.shape),
            attn_mask=cross_attn_mask,
        )
        query = LayerNormF32(name="norm1")(query + attn_out)

        attn_out = MultiHeadAttention(
            self.embed_dim, self.num_heads, dtype=self.dtype, name="self_attn"
        )(query, query, query, query_pos=query_pos, key_pos=query_pos)
        query = LayerNormF32(name="norm2")(query + attn_out)

        query = FFN(self.ffn_dim, self.embed_dim, dtype=self.dtype, name="ffn")(query)
        query = LayerNormF32(name="norm3")(query)
        return query
