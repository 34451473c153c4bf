"""CLIP byte-pair-encoding tokenizer (clean-room).

Host-side equivalent of OpenAI ``clip.tokenize`` (reference
coco_open.py:342-355 tokenizes captions and "A photo of a {noun}"
prompts). Standard byte-level BPE: text is lower-cased, whitespace
normalized, split into words, each word mapped to byte-unicode symbols
with an end-of-word marker, then greedily merged by rank from the merges
file. The GPT-2-style byte<->unicode table is algorithmic; the MERGES
LIST is a released asset (``bpe_simple_vocab_16e6.txt``) that must be
provided — a zero-egress environment cannot reconstruct it, so the
tokenizer raises without it (tests use a tiny synthetic merges list).
"""

from __future__ import annotations

import os
import re
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]+")


def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 byte -> printable-unicode mapping (algorithmic)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class ClipBPETokenizer:
    def __init__(
        self,
        merges: Sequence[Tuple[str, str]],
        context_length: int = 77,
    ):
        self.byte_encoder = bytes_to_unicode()
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        # vocab order mirrors CLIP: single symbols, symbols+</w>, merges'
        # concatenations, then the two special tokens
        symbols = list(self.byte_encoder.values())
        vocab: List[str] = symbols + [s + "</w>" for s in symbols]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self.context_length = context_length
        self._cache: Dict[str, List[str]] = {}

    @classmethod
    def from_merges_file(cls, path: str, context_length: int = 77):
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"CLIP BPE merges file not found: {path} (the released "
                "bpe_simple_vocab_16e6.txt — not reconstructible offline)"
            )
        with open(path, encoding="utf-8") as f:
            lines = f.read().split("\n")
        # released file: first line is a version header; merges follow
        merges = [
            tuple(line.split()) for line in lines[1 : 49152 - 256 - 2 + 1]
            if len(line.split()) == 2
        ]
        return cls(merges, context_length)

    def _bpe(self, word: str) -> List[str]:
        if word in self._cache:
            return self._cache[word]
        symbols = [self.byte_encoder[b] for b in word.encode("utf-8")]
        if not symbols:
            return []
        symbols[-1] = symbols[-1] + "</w>"
        while len(symbols) > 1:
            pairs = [
                (self.bpe_ranks.get((a, b), 1 << 30), i)
                for i, (a, b) in enumerate(zip(symbols, symbols[1:]))
            ]
            rank, i = min(pairs)
            if rank >= 1 << 30:
                break
            symbols = symbols[:i] + [symbols[i] + symbols[i + 1]] + symbols[i + 2 :]
        self._cache[word] = symbols
        return symbols

    def encode(self, text: str) -> List[int]:
        text = " ".join(text.lower().strip().split())
        ids: List[int] = [self.sot]
        for word in _WORD_RE.findall(text):
            for sym in self._bpe(word):
                ids.append(self.encoder.get(sym, 0))
        ids.append(self.eot)
        ids = ids[: self.context_length]
        ids[-1] = self.eot  # EOT always present (truncation keeps it)
        return ids + [0] * (self.context_length - len(ids))

    def tokenize(self, texts: Iterable[str]):
        import numpy as np

        return np.asarray([self.encode(t) for t in texts], np.int32)


def synthetic_merges(words: Optional[Sequence[str]] = None):
    """Tiny merges list for tests: greedily merge each word's symbols
    left-to-right so common test words become single tokens."""
    be = bytes_to_unicode()
    merges: List[Tuple[str, str]] = []
    seen = set()
    for w in words or ("a", "photo", "of", "dog", "cat"):
        syms = [be[b] for b in w.encode("utf-8")]
        syms[-1] += "</w>"
        while len(syms) > 1:
            pair = (syms[0], syms[1])
            if pair not in seen:
                seen.add(pair)
                merges.append(pair)
            syms = [syms[0] + syms[1]] + syms[2:]
    return merges
