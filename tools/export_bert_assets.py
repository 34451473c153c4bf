#!/usr/bin/env python
"""Export BERT assets (run once in an environment with HF access).

Produces the files the framework loads at runtime (models/bert.py,
data/tokenizer.py):
- assets/bert.npz: word_embeddings (30522x768), ln_scale, ln_bias
- assets/bert_vocab.txt: WordPiece vocabulary, one token per line

The reference instead reloads bert-base-uncased from HF at model build
time (open_set/models/utils/bert_embeddings.py:4-14); shipping the table
as an asset keeps the zero-egress TPU environment self-contained.

Usage: python tools/export_bert_assets.py [--out-dir betrayed_by_captions_tpu/assets]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def verify_assets(out_dir: str, expect_sha: str = None) -> str:
    """Reload the exported files through the runtime loaders and verify
    their structure; returns the sha256 of bert.npz's embedding bytes.

    Record the printed sha next to the export (e.g. in the run log or a
    checksum file); any future re-export or copy can then be checked with
    ``--verify --expect-sha <sha>``.
    """
    import hashlib

    import numpy as np

    from betrayed_by_captions_tpu.data.tokenizer import load_tokenizer
    from betrayed_by_captions_tpu.models.bert import load_bert_assets

    assets = load_bert_assets(os.path.join(out_dir, "bert.npz"))
    vocab_path = os.path.join(out_dir, "bert_vocab.txt")
    tok = load_tokenizer(vocab_path)
    n_vocab = len(open(vocab_path, encoding="utf-8").read().splitlines())
    emb = np.ascontiguousarray(assets.word_embeddings)
    assert emb.shape[0] == n_vocab, (emb.shape, n_vocab)
    assert assets.ln_scale.shape == (emb.shape[1],)
    assert assets.ln_bias.shape == (emb.shape[1],)
    # tokenizer round-trip through special tokens
    ids, mask = tok.encode("a test sentence")
    assert len(ids) > 0 and sum(mask) > 0
    sha = hashlib.sha256(emb.tobytes()).hexdigest()
    print(f"verified: emb {emb.shape}, vocab {n_vocab}, sha256 {sha}")
    if expect_sha and sha != expect_sha:
        raise SystemExit(
            f"sha mismatch: expected {expect_sha}, got {sha}"
        )
    return sha


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--out-dir", default="betrayed_by_captions_tpu/assets"
    )
    parser.add_argument("--model", default="bert-base-uncased")
    parser.add_argument(
        "--verify", action="store_true",
        help="reload through the runtime loaders and print the sha256",
    )
    parser.add_argument("--expect-sha", default=None)
    args = parser.parse_args()

    if args.verify and os.path.exists(
        os.path.join(args.out_dir, "bert.npz")
    ):
        verify_assets(args.out_dir, args.expect_sha)
        return

    import numpy as np
    from transformers import BertModel, BertTokenizer

    model = BertModel.from_pretrained(args.model)
    tokenizer = BertTokenizer.from_pretrained(args.model)

    emb = model.embeddings.word_embeddings.weight.detach().numpy()
    ln = model.embeddings.LayerNorm
    np.savez(
        os.path.join(args.out_dir, "bert.npz"),
        word_embeddings=emb.astype(np.float32),
        ln_scale=ln.weight.detach().numpy().astype(np.float32),
        ln_bias=ln.bias.detach().numpy().astype(np.float32),
    )

    vocab = sorted(tokenizer.vocab.items(), key=lambda kv: kv[1])
    with open(os.path.join(args.out_dir, "bert_vocab.txt"), "w") as f:
        for token, _ in vocab:
            f.write(token + "\n")
    print(f"wrote bert.npz ({emb.shape}) and bert_vocab.txt ({len(vocab)} tokens)")


if __name__ == "__main__":
    main()
