"""Multi-head attention with DETR-style positional embeddings and masks.

TPU-native stand-in for mmcv's ``MultiheadAttention`` as used by the
reference transformer decoder (configs/instance/coco_b48n17.py:79-86) and
for the reference's from-scratch caption-decoder attention blocks
(open_set/models/transformers/transformers.py:58-137).

Conventions (batch-first, additive masking):
- q/k get positional embeddings added pre-projection; v never does
  (mmcv MultiheadAttention semantics),
- ``attn_mask``: boolean (..., Q, K), True = BLOCKED,
- ``key_padding_mask``: boolean (B, K), True = PAD (blocked),
- softmax in fp32 for stability, matmuls accept a compute dtype.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

_NEG = -1e9  # large negative for blocked logits (avoids NaNs vs -inf rows)


def _attend(
    q: jnp.ndarray,  # (B, H, Q, D)
    k: jnp.ndarray,  # (B, H, K, D)
    v: jnp.ndarray,  # (B, H, K, D)
    attn_mask: Optional[jnp.ndarray],  # (B, H, Q, K) or (B, 1, Q, K) bool
    key_padding_mask: Optional[jnp.ndarray],  # (B, K) bool
) -> jnp.ndarray:
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(d))
    if attn_mask is not None:
        logits = jnp.where(attn_mask, _NEG, logits)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], _NEG, logits)
    weights = nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)


class MultiHeadAttention(nn.Module):
    """Generic MHA over (B, N, C) tensors with separate q/k/v projections."""

    embed_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        query_pos: Optional[jnp.ndarray] = None,
        key_pos: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, nq, c = query.shape
        nk = key.shape[1]
        hd = self.embed_dim // self.num_heads

        q_in = query if query_pos is None else query + query_pos
        k_in = key if key_pos is None else key + key_pos

        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(q_in)
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(k_in)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(value)

        q = q.reshape(b, nq, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, nk, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, nk, self.num_heads, hd).transpose(0, 2, 1, 3)

        if attn_mask is not None and attn_mask.ndim == 3:
            attn_mask = attn_mask[:, None]  # broadcast over heads

        out = _attend(q, k, v, attn_mask, key_padding_mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, self.embed_dim)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(out)
