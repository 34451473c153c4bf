"""CLIP text-encoder option (asset-gated): tokenizer BPE behavior, encoder
shape/pooling contract, embedder grounding interface."""

import numpy as np
import pytest

import jax.numpy as jnp

from betrayed_by_captions_tpu.data.clip_tokenizer import (
    ClipBPETokenizer,
    bytes_to_unicode,
    synthetic_merges,
)
from betrayed_by_captions_tpu.models.clip_text import (
    CLIPTextEncoder,
    ClipTextConfig,
    ClipTextEmbedder,
    load_clip_assets,
    synthetic_clip_params,
)

TINY = ClipTextConfig(
    vocab_size=2000, context_length=16, width=32, heads=4, layers=2,
    embed_dim=24,
)


class TestBPETokenizer:
    def test_byte_unicode_table_bijective(self):
        table = bytes_to_unicode()
        assert len(table) == 256
        assert len(set(table.values())) == 256

    def test_merged_words_single_token(self):
        tok = ClipBPETokenizer(synthetic_merges(), context_length=12)
        ids = tok.encode("a photo of a dog")
        assert ids[0] == tok.sot
        assert tok.eot in ids
        # 'photo' fully merged -> one id between sot and eot
        ids2 = tok.encode("photo")
        content = [i for i in ids2 if i not in (tok.sot, tok.eot, 0)]
        assert len(content) == 1

    def test_pads_and_truncates_with_eot(self):
        tok = ClipBPETokenizer(synthetic_merges(), context_length=8)
        ids = tok.encode("dog " * 30)
        assert len(ids) == 8
        assert ids[-1] == tok.eot
        short = tok.encode("dog")
        assert len(short) == 8 and short.count(0) > 0

    def test_missing_merges_file_raises(self):
        with pytest.raises(FileNotFoundError):
            ClipBPETokenizer.from_merges_file("/nonexistent/bpe.txt")


class TestClipEncoder:
    def test_eot_pooling_and_shapes(self):
        params = synthetic_clip_params(TINY)
        model = CLIPTextEncoder(TINY)
        ids = np.zeros((3, TINY.context_length), np.int32)
        ids[:, 0] = 10
        ids[0, 1], ids[0, 2] = 5, TINY.vocab_size - 1  # EOT at pos 2
        ids[1, 1] = TINY.vocab_size - 1
        ids[2, 1:4] = [7, 8, TINY.vocab_size - 1]
        out = model.apply({"params": params}, jnp.asarray(ids))
        assert out.shape == (3, TINY.embed_dim)
        assert np.isfinite(np.asarray(out)).all()
        # suffix past EOT must not change the pooled feature (causal mask)
        ids2 = ids.copy()
        ids2[0, 5:] = 99
        out2 = model.apply({"params": params}, jnp.asarray(ids2))
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(out2[0]), rtol=1e-5, atol=1e-6
        )

    def test_asset_gate(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_clip_assets(str(tmp_path / "missing.npz"), TINY)
        with pytest.warns(UserWarning):
            params = load_clip_assets(
                str(tmp_path / "missing.npz"), TINY, allow_synthetic=True
            )
        assert "token_embedding" in params

    def test_embedder_grounding_contract(self):
        """Rank-3 noun-prompt ids -> (B, T, d) L2-normalized embeddings,
        the caption_embed interface the grounding loss consumes."""
        params = synthetic_clip_params(TINY)
        emb = ClipTextEmbedder(params, TINY)
        ids = np.zeros((2, 3, TINY.context_length), np.int32)
        ids[..., 0] = 10
        ids[..., 1] = TINY.vocab_size - 1
        out = emb(jnp.asarray(ids))
        assert out.shape == (2, 3, TINY.embed_dim)
        norms = np.linalg.norm(np.asarray(out), axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
