"""Class-name embedding banks and base/novel split bookkeeping.

TPU-native equivalent of the reference's class-embedding buffers:

- the head's training bank: known-minus-unknown (= base) class embeddings
  + a zero background row (open_set/models/mask2former_head.py:202-217),
- the fusion head's all/novel/base banks used for open-vocabulary
  classification at test time
  (open_set/models/maskformer_fusion_head.py:44-73).

Assets are the JSON files of precomputed BERT class-name embeddings and the
known/unknown split lists shipped with the reference (data, not code:
datasets/embeddings/*.json, datasets/unknown/*.txt); copies live under
``betrayed_by_captions_tpu/assets/``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")


def asset_path(*parts: str) -> str:
    return os.path.abspath(os.path.join(_ASSET_DIR, *parts))


def read_split(path: str) -> List[str]:
    with open(path) as f:
        return [line for line in f.read().split("\n") if line != ""]


@dataclass
class ClassEmbeddingBanks:
    """Embedding banks with a trailing zero 'background' row each."""

    names_all: List[str]  # bank order of all classes
    names_base: List[str]
    names_novel: List[str]
    ids_all: List[int]  # dataset category ids in bank order
    train_bank: np.ndarray  # (num_base + 1, d): training classification bank
    all_bank: np.ndarray  # (num_all + 1, d)
    base_bank: np.ndarray  # (num_base + 1, d)
    novel_bank: np.ndarray  # (num_novel + 1, d)

    @property
    def emb_dim(self) -> int:
        return self.train_bank.shape[1]

    @property
    def num_base(self) -> int:
        return self.base_bank.shape[0] - 1

    @property
    def num_novel(self) -> int:
        return self.novel_bank.shape[0] - 1

    @property
    def num_all(self) -> int:
        return self.all_bank.shape[0] - 1

    def label_map_base(self) -> Dict[str, int]:
        return {n: i for i, n in enumerate(self.names_base)}

    def label_map_all(self) -> Dict[str, int]:
        return {n: i for i, n in enumerate(self.names_all)}


def load_class_banks(
    class_to_emb_file: str,
    known_file: Optional[str] = None,
    unknown_file: Optional[str] = None,
    text_emb_norm: bool = False,
) -> ClassEmbeddingBanks:
    """Build all banks from a class->embedding JSON and split files.

    Iteration order follows the JSON (the reference's convention), so
    label indices line up with the original implementation.

    Note: ``text_emb_norm`` in the reference applies BERT LayerNorm to
    caption words, not to these banks — the JSON embeddings are used as-is.
    """
    with open(class_to_emb_file) as f:
        class_to_emb = json.load(f)
    known = set(read_split(known_file)) if known_file else None
    unknown = set(read_split(unknown_file)) if unknown_file else set()

    dim = len(class_to_emb[0]["emb"])
    names_all: List[str] = []
    ids_all: List[int] = []
    names_base: List[str] = []
    names_novel: List[str] = []
    embs_all: List[np.ndarray] = []
    embs_base: List[np.ndarray] = []
    embs_novel: List[np.ndarray] = []

    for entry in class_to_emb:
        name = entry["name"]
        if known is not None and name not in known:
            continue
        emb = np.asarray(entry["emb"], dtype=np.float32)
        names_all.append(name)
        ids_all.append(int(entry.get("id", len(ids_all))))
        embs_all.append(emb)
        if name in unknown:
            names_novel.append(name)
            embs_novel.append(emb)
        else:
            names_base.append(name)
            embs_base.append(emb)

    def bank(embs: Sequence[np.ndarray]) -> np.ndarray:
        rows = list(embs) + [np.zeros((dim,), np.float32)]  # zero bg row
        return np.stack(rows, axis=0)

    return ClassEmbeddingBanks(
        names_all=names_all,
        names_base=names_base,
        names_novel=names_novel,
        ids_all=ids_all,
        train_bank=bank(embs_base),
        all_bank=bank(embs_all),
        base_bank=bank(embs_base),
        novel_bank=bank(embs_novel),
    )
