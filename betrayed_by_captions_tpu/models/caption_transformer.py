"""Caption generation head: transformer decoder over BERT token embeddings.

TPU-native equivalent of the reference ``CaptionTransformer``
(open_set/models/transformers/caption_tranformer.py:17-44: 4 layers,
hidden 768, FFN 512, 8 heads, dropout 0.1, post-norm, vocab 30522) built on
the reference's from-scratch blocks (transformers.py:186-292). Contract
preserved for parity:

- decoder block order: causal self-attn -> LN, cross-attn to the 100 query
  embeddings (memory) -> LN, FFN -> LN (post-norm),
- returns ALL layers' hidden states — beam search averages the generator
  logits across layers (open_set/utils/eval/inference.py:91-113),
- 1-D sinusoidal positional encoding added to target embeddings,
- ``generator``: Dense(vocab) applied outside or via :meth:`logits`.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.positional import sinusoidal_table_1d
from .attention import MultiHeadAttention
from .common import LayerNormF32

Dtype = Any


class CaptionDecoderBlock(nn.Module):
    hidden_dim: int = 768
    ff_dim: int = 512
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # (B, T, C)
        memory: jnp.ndarray,  # (B, M, C)
        causal_mask: jnp.ndarray,  # (T, T) bool, True = blocked
        tgt_key_padding_mask: Optional[jnp.ndarray],  # (B, T) bool, True = pad
        deterministic: bool,
    ) -> jnp.ndarray:
        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)

        attn = MultiHeadAttention(
            self.hidden_dim, self.num_heads, dtype=self.dtype, name="self_attn"
        )(
            tgt,
            tgt,
            tgt,
            attn_mask=jnp.broadcast_to(
                causal_mask[None, None], (tgt.shape[0], 1) + causal_mask.shape
            ),
            key_padding_mask=tgt_key_padding_mask,
        )
        tgt = LayerNormF32(name="norm1")(tgt + drop(attn))

        attn = MultiHeadAttention(
            self.hidden_dim, self.num_heads, dtype=self.dtype, name="cross_attn"
        )(tgt, memory, memory)
        tgt = LayerNormF32(name="norm2")(tgt + drop(attn))

        y = nn.Dense(self.ff_dim, dtype=self.dtype, name="ffn_fc1")(tgt)
        y = nn.relu(y)
        y = nn.Dense(self.hidden_dim, dtype=self.dtype, name="ffn_fc2")(y)
        tgt = LayerNormF32(name="norm3")(tgt + drop(y))
        return tgt


class CaptionTransformer(nn.Module):
    num_layers: int = 4
    input_dim: int = 768
    hidden_dim: int = 768
    ff_dim: int = 512
    num_heads: int = 8
    dropout: float = 0.1
    seq_length: int = 35
    vocab_size: int = 30522
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.input_dim != self.hidden_dim:
            self.adapter = nn.Dense(self.hidden_dim, dtype=self.dtype, name="adapter")
            self.adapter_tgt = nn.Dense(
                self.hidden_dim, dtype=self.dtype, name="adapter_tgt"
            )
        self.input_dropout = nn.Dropout(self.dropout)
        self.layers = [
            CaptionDecoderBlock(
                hidden_dim=self.hidden_dim,
                ff_dim=self.ff_dim,
                num_heads=self.num_heads,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layer{li}",
            )
            for li in range(self.num_layers)
        ]
        self.generator = nn.Dense(self.vocab_size, dtype=self.dtype, name="generator")

    def __call__(
        self,
        tgt_embs: jnp.ndarray,  # (B, T, input_dim) token embeddings
        memory: jnp.ndarray,  # (B, M, input_dim) query embeddings
        tgt_key_padding_mask: Optional[jnp.ndarray] = None,  # (B, T) True = pad
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (all_hidden (L, B, T, C), last_layer_logits (B, T, V))."""
        t = tgt_embs.shape[1]
        if self.input_dim != self.hidden_dim:
            memory = self.adapter(memory)
            tgt_embs = self.adapter_tgt(tgt_embs)

        pos_table = jnp.asarray(sinusoidal_table_1d(self.seq_length, self.hidden_dim))
        tgt = tgt_embs + pos_table[None, :t, :].astype(tgt_embs.dtype)
        tgt = self.input_dropout(tgt, deterministic=deterministic)

        causal = jnp.triu(jnp.ones((t, t), dtype=bool), k=1)  # True above diag

        hidden: List[jnp.ndarray] = []
        for li in range(self.num_layers):
            tgt = self.layers[li](
                tgt, memory, causal, tgt_key_padding_mask, deterministic
            )
            hidden.append(tgt)

        all_hidden = jnp.stack(hidden, axis=0)  # (L, B, T, C)
        logits = self.generate(hidden[-1])
        return all_hidden, logits

    def generate(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """Vocabulary projection, shared across layers for logit averaging."""
        return self.generator(hidden)
