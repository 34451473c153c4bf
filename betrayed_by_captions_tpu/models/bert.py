"""Frozen BERT word-embedding table + LayerNorm, loaded from an asset file.

TPU-native equivalent of the reference's ``BertEmbeddings``
(open_set/models/utils/bert_embeddings.py:4-14): only the word-embedding
matrix and its LayerNorm are used (the reference reloads them from HF
``bert-base-uncased`` at build time to keep checkpoints small,
open_set/models/mask2former_head.py:249-254). Here they are shipped as an
``.npz`` asset (30522x768 fp32 + LayerNorm scale/bias) generated once by
``tools/export_bert_assets.py``; tests use a deterministic synthetic table.

The embeddings are constants baked into the jitted step (not trained), so
they live outside the optimizer entirely.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

BERT_VOCAB_SIZE = 30522
BERT_DIM = 768
BERT_LN_EPS = 1e-12
BOS_TOKEN = 101  # [CLS], reference mask2former_head.py:30
EOS_TOKEN = 102  # [SEP], reference mask2former_head.py:31
PAD_TOKEN = 0


class BertAssets(NamedTuple):
    word_embeddings: np.ndarray  # (vocab, 768)
    ln_scale: np.ndarray  # (768,)
    ln_bias: np.ndarray  # (768,)


def synthetic_bert_assets(
    vocab_size: int = BERT_VOCAB_SIZE, dim: int = BERT_DIM, seed: int = 0
) -> BertAssets:
    """Deterministic stand-in table for tests / environments without the
    real weights. NOT suitable for accuracy parity runs."""
    rs = np.random.RandomState(seed)
    table = rs.randn(vocab_size, dim).astype(np.float32) * 0.02
    return BertAssets(
        word_embeddings=table,
        ln_scale=np.ones((dim,), np.float32),
        ln_bias=np.zeros((dim,), np.float32),
    )


def load_bert_assets(
    path: Optional[str] = None, allow_synthetic: bool = False
) -> BertAssets:
    """Load the real embedding asset (``assets/bert.npz``).

    Raises if the asset is missing: every caption/grounding-dependent
    metric computed from a random table is numerically meaningless, so a
    silent fallback is never acceptable. Tests and smoke runs that don't
    care about caption numerics opt in explicitly with
    ``allow_synthetic=True`` (or construct ``synthetic_bert_assets()``
    directly)."""
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "..", "assets", "bert.npz")
    path = os.path.abspath(path)
    if os.path.exists(path):
        data = np.load(path)
        return BertAssets(
            word_embeddings=data["word_embeddings"].astype(np.float32),
            ln_scale=data["ln_scale"].astype(np.float32),
            ln_bias=data["ln_bias"].astype(np.float32),
        )
    if allow_synthetic:
        import warnings

        warnings.warn(
            f"BERT asset {path} not found — using a SYNTHETIC random "
            "embedding table. Caption/grounding losses and metrics are "
            "numerically meaningless; export the real table with "
            "tools/export_bert_assets.py before any parity run.",
            stacklevel=2,
        )
        return synthetic_bert_assets()
    raise FileNotFoundError(
        f"BERT embedding asset not found at {path}. Export it once with "
        "tools/export_bert_assets.py (requires the bert-base-uncased "
        "weights), or pass allow_synthetic=True for smoke tests that do "
        "not depend on caption numerics."
    )


class BertWordEmbeddings:
    """Functional embedding lookup with optional LayerNorm.

    The reference applies the BERT LayerNorm when ``text_emb_norm=True``
    (mask2former_head.py:694-696), which is the shipped-config behavior.
    """

    def __init__(self, assets: BertAssets):
        self.table = jnp.asarray(assets.word_embeddings)
        self.ln_scale = jnp.asarray(assets.ln_scale)
        self.ln_bias = jnp.asarray(assets.ln_bias)

    @property
    def vocab_size(self) -> int:
        return self.table.shape[0]

    def __call__(self, ids: jnp.ndarray, layer_norm: bool = True) -> jnp.ndarray:
        embs = jnp.take(self.table, ids, axis=0)
        if layer_norm:
            mean = embs.mean(axis=-1, keepdims=True)
            var = embs.var(axis=-1, keepdims=True)
            embs = (embs - mean) / jnp.sqrt(var + BERT_LN_EPS)
            embs = embs * self.ln_scale + self.ln_bias
        return embs
