"""BERT WordPiece tokenizer (self-contained, host-side).

TPU-native-framework equivalent of the reference's dependency on HF
``BertTokenizer.from_pretrained('bert-base-uncased')``
(open_set/datasets/coco_open.py:118, open_set/utils/eval/inference.py:151).
The environment has no network/HF cache, so the tokenizer is implemented
from the WordPiece algorithm spec and loads its vocabulary from an asset
file (``assets/bert_vocab.txt``, one token per line — the standard BERT
vocab format; generate with ``tools/export_bert_assets.py`` where HF is
available). Tests use a small synthetic vocabulary.

Pipeline (uncased BERT): basic tokenization (lowercase, accent strip,
punctuation split) then greedy longest-match-first WordPiece with '##'
continuation pieces, max 200 chars/word -> [UNK].
"""

from __future__ import annotations

import os
import unicodedata
from typing import Dict, List, Optional

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_chinese_char(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0xF900 <= cp <= 0xFAFF
    )


def basic_tokenize(text: str, lowercase: bool = True) -> List[str]:
    """Whitespace + punctuation splitting with unicode cleanup."""
    out_chars: List[str] = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or unicodedata.category(ch) == "Cc" and ch not in "\t\n\r":
            continue
        if _is_chinese_char(cp):
            out_chars.extend([" ", ch, " "])
        elif ch in "\t\n\r" or unicodedata.category(ch) == "Zs":
            out_chars.append(" ")
        else:
            out_chars.append(ch)
    text = "".join(out_chars)

    tokens: List[str] = []
    for word in text.split():
        if lowercase:
            word = word.lower()
            word = "".join(
                c
                for c in unicodedata.normalize("NFD", word)
                if unicodedata.category(c) != "Mn"
            )
        current: List[str] = []
        for ch in word:
            if _is_punctuation(ch):
                if current:
                    tokens.append("".join(current))
                    current = []
                tokens.append(ch)
            else:
                current.append(ch)
        if current:
            tokens.append("".join(current))
    return tokens


class WordPieceTokenizer:
    def __init__(self, vocab: Dict[str, int], lowercase: bool = True):
        self.vocab = vocab
        self.inv_vocab = {i: t for t, i in vocab.items()}
        self.lowercase = lowercase
        self.pad_id = vocab.get(PAD, 0)
        self.unk_id = vocab.get(UNK, 1)
        self.cls_id = vocab.get(CLS, 101 if CLS not in vocab else vocab[CLS])
        self.sep_id = vocab.get(SEP, 102 if SEP not in vocab else vocab[SEP])

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def wordpiece(self, word: str) -> List[str]:
        if len(word) > 200:
            return [UNK]
        pieces: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return [UNK]
            pieces.append(piece)
            start = end
        return pieces

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for word in basic_tokenize(text, self.lowercase):
            out.extend(self.wordpiece(word))
        return out

    def encode(
        self,
        text: str,
        max_length: int = 35,
        add_special_tokens: bool = True,
        pad_to_max: bool = True,
    ):
        """Returns (ids, attention_mask) like HF's __call__ with
        padding='max_length', truncation=True (reference coco_open.py usage)."""
        tokens = self.tokenize(text)
        if add_special_tokens:
            tokens = [CLS] + tokens[: max_length - 2] + [SEP]
        else:
            tokens = tokens[:max_length]
        ids = [self.vocab.get(t, self.unk_id) for t in tokens]
        mask = [1] * len(ids)
        if pad_to_max and len(ids) < max_length:
            pad_n = max_length - len(ids)
            ids = ids + [self.pad_id] * pad_n
            mask = mask + [0] * pad_n
        return ids[:max_length], mask[:max_length]

    def decode(self, ids, skip_special: bool = False) -> str:
        tokens = []
        for i in ids:
            t = self.inv_vocab.get(int(i), UNK)
            if skip_special and t in (PAD, CLS, SEP):
                continue
            tokens.append(t)
        text = " ".join(tokens)
        return text.replace(" ##", "")


def synthetic_vocab(extra_words: Optional[List[str]] = None) -> Dict[str, int]:
    """Tiny deterministic vocabulary for tests: specials at BERT positions."""
    vocab: Dict[str, int] = {}
    vocab[PAD] = 0
    for i in range(1, 100):
        vocab[f"[unused{i}]"] = i
    vocab[UNK] = 100
    vocab[CLS] = 101
    vocab[SEP] = 102
    vocab[MASK] = 103
    words = extra_words or []
    # covers every caption data/synthetic.py generates ("a photo of a
    # <name> and a <name>", names from CLASS_NAMES)
    base = ["a", "the", "dog", "cat", "person", "##s", "on", "bench",
            "photo", "of", "and", "car"]
    for w in base + words:
        if w not in vocab:
            vocab[w] = len(vocab)
    return vocab


def load_tokenizer(vocab_path: Optional[str] = None) -> WordPieceTokenizer:
    """Load from assets/bert_vocab.txt if present, else synthetic."""
    if vocab_path is None:
        vocab_path = os.path.join(
            os.path.dirname(__file__), "..", "assets", "bert_vocab.txt"
        )
    vocab_path = os.path.abspath(vocab_path)
    if os.path.exists(vocab_path):
        vocab: Dict[str, int] = {}
        with open(vocab_path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return WordPieceTokenizer(vocab)
    return WordPieceTokenizer(synthetic_vocab())
