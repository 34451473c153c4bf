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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--out-dir", default="betrayed_by_captions_tpu/assets"
    )
    parser.add_argument("--model", default="bert-base-uncased")
    args = parser.parse_args()

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
