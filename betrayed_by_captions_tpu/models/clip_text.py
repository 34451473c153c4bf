"""CLIP text encoder (RN50 variant) — the reference's optional alternative
to BERT word embeddings.

TPU-native equivalent of the ``emb_type='clip'`` path (reference
mask2former_head.py:255-260 builds a frozen OpenAI CLIP RN50; nouns are
tokenized as "A photo of a {noun}" and encoded with ``encode_text``,
coco_open.py:342-355 / mask2former_head.py:699-708). Not used by any
shipped config; code-complete but ASSET-GATED like the BERT table: the
weights must be exported once from the released CLIP checkpoint
(tools/export_clip_assets.py) — zero-egress environments get a loud
error, tests opt into a synthetic tiny model.

Architecture (CLIP RN50 text tower): byte-BPE vocab 49408, context 77,
width 512, 8 heads, 12 pre-LN causal transformer blocks, final LayerNorm,
features taken at the EOT token (argmax of ids) and projected to the
1024-d joint space.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class ClipTextConfig(NamedTuple):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 1024  # RN50 joint space


class _ResidualBlock(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        h = nn.SelfAttention(
            num_heads=self.heads,
            qkv_features=self.width,
            dtype=self.dtype,
            name="attn",
        )(h, mask=causal_mask)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="fc")(h)
        # CLIP uses QuickGELU: x * sigmoid(1.702 x)
        h = h * jax.nn.sigmoid(1.702 * h)
        h = nn.Dense(self.width, dtype=self.dtype, name="proj")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    config: ClipTextConfig = ClipTextConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        """ids: (N, context) int32 with SOT ... EOT padding-0 rows.

        Returns (N, embed_dim) EOT-pooled projected features."""
        cfg = self.config
        tok = nn.Embed(
            cfg.vocab_size, cfg.width, dtype=self.dtype,
            name="token_embedding",
        )(ids)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        x = tok + pos[None, : ids.shape[1], :].astype(tok.dtype)

        t = ids.shape[1]
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        for li in range(cfg.layers):
            x = _ResidualBlock(
                width=cfg.width, heads=cfg.heads, dtype=self.dtype,
                name=f"resblock{li}",
            )(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)

        # pooled feature at the EOT token (highest id in CLIP's vocab)
        eot = jnp.argmax(ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(cfg.width ** -0.5),
            (cfg.width, cfg.embed_dim),
        )
        return pooled @ proj.astype(pooled.dtype)


def synthetic_clip_params(
    cfg: ClipTextConfig, seed: int = 0
) -> dict:
    """Tiny-model-friendly random params for tests. NOT real CLIP."""
    model = CLIPTextEncoder(cfg)
    return model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, cfg.context_length), jnp.int32),
    )["params"]


def load_clip_assets(
    path: Optional[str] = None,
    cfg: ClipTextConfig = ClipTextConfig(),
    allow_synthetic: bool = False,
):
    """Load exported CLIP text-tower params (flat npz with /-joined keys).

    Raises when the asset is missing unless ``allow_synthetic``: CLIP
    embeddings from random weights are numerically meaningless."""
    from ..engine.checkpoint import load_params

    if path is None:
        path = os.path.join(
            os.path.dirname(__file__), "..", "assets", "clip_text.npz"
        )
    path = os.path.abspath(path)
    if os.path.exists(path):
        template = synthetic_clip_params(cfg)
        return load_params(path, template)
    if allow_synthetic:
        import warnings

        warnings.warn(
            f"CLIP asset {path} not found — using SYNTHETIC random weights."
            " Export the real text tower with tools/export_clip_assets.py"
            " before any parity run.",
            stacklevel=2,
        )
        return synthetic_clip_params(cfg)
    raise FileNotFoundError(
        f"CLIP text-encoder asset not found at {path}; export it with "
        "tools/export_clip_assets.py or pass allow_synthetic=True for "
        "smoke tests."
    )


class ClipTextEmbedder:
    """Frozen text embedder with the same call contract as
    ``BertWordEmbeddings`` for the grounding path: rank-3 noun-prompt ids
    (B, T, context) -> (B, T, embed_dim) L2-normalized EOT embeddings
    (reference extract_word_embeddings 'clip' branch,
    mask2former_head.py:699-708)."""

    def __init__(self, params, cfg: ClipTextConfig = ClipTextConfig()):
        self.cfg = cfg
        self.params = params
        self.model = CLIPTextEncoder(cfg)

    def __call__(self, ids: jnp.ndarray, layer_norm: bool = True) -> jnp.ndarray:
        shape = ids.shape
        flat = ids.reshape(-1, shape[-1])
        embs = self.model.apply({"params": self.params}, flat)
        embs = embs / jnp.linalg.norm(embs, axis=-1, keepdims=True)
        return embs.reshape(shape[:-1] + (self.cfg.embed_dim,))
