"""Caption -> object-noun parsers (host-side, self-contained).

TPU-framework equivalent of the reference's caption-noun extraction
(open_set/datasets/utils/parser.py:15-158). The reference uses spaCy
lemmatization + LVIS-synonym matching (LVISParser) or NLTK POS tagging
(NLTKParser); neither model/corpus is downloadable in a zero-egress
environment, so:

- lemmatization is a deterministic rule-based English noun lemmatizer
  (inflection stripping) — adequate for object nouns in COCO captions.
  QUANTIFIED deviation (tests/test_parser_fixture.py on the frozen
  200-caption fixture, 401 expected matches derived with the reference's
  own matching rule): micro precision 0.9975 / recall 0.9975. The two
  known failure classes: verb inflections are not lemmatized (reference
  spaCy matches "spraying" to atomizer's "spray" synonym; we don't), and
  "people" -> "person" (we tag person; the reference does not, since
  spaCy keeps "people"),
- ``LVISParser`` matches lemmatized LVIS synonyms (shipped as the data
  asset ``assets/lvis_synonyms.json``) inside the lemmatized caption with
  word-boundary semantics, like the reference,
- ``POSParser`` uses NLTK when its corpora are installed and otherwise
  falls back to vocabulary matching.

Parsing is a CPU hot spot in the reference (per-sample spaCy parse in the
dataloader, SURVEY.md §3.1); here parsers memoize per caption and datasets
precompute nouns once per epoch into a cache.
"""

from __future__ import annotations

import json
import os
import re
from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

_IRREGULAR = {
    "men": "man",
    "women": "woman",
    "children": "child",
    "people": "person",
    "teeth": "tooth",
    "feet": "foot",
    "geese": "goose",
    "mice": "mouse",
    "knives": "knife",
    "leaves": "leaf",
    "loaves": "loaf",
    "wolves": "wolf",
    "shelves": "shelf",
    "scarves": "scarf",
    "wives": "wife",
    "lives": "life",
    "skis": "ski",
    "buses": "bus",
    "gases": "gas",
}

# plurals of -oe words: strip only the trailing "s" (the generic "-oes"
# rule below is for potato/tomato-style plurals)
_OE_PLURALS = ("shoes", "canoes", "toes", "oboes", "aloes", "horseshoes")

_KEEP_S = {
    "glass", "bus", "dress", "its", "this", "tennis", "grass", "press",
    "chess", "class", "mattress", "cross", "address", "is", "was", "has",
    "gas", "less", "plus", "christmas", "pants", "scissors", "shorts",
}


def lemmatize_word(word: str) -> str:
    """Rule-based English noun lemmatization (singularization)."""
    w = word.lower()
    if w in _IRREGULAR:
        return _IRREGULAR[w]
    if w in _KEEP_S or len(w) <= 3:
        return w
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith(("ches", "shes", "sses", "xes", "zes")):
        return w[:-2]
    if w in _OE_PLURALS:
        return w[:-1]
    if w.endswith("oes") and len(w) > 4:
        return w[:-2]
    if w.endswith("s") and not w.endswith(("ss", "us", "is")):
        return w[:-1]
    return w


_WORD_RE = re.compile(r"[a-z0-9]+(?:[-'][a-z0-9]+)*")


def lemmatize_sentence(sentence: str) -> str:
    words = _WORD_RE.findall(sentence.lower())
    return " ".join(lemmatize_word(w) for w in words)


def _default_lvis_path() -> str:
    return os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "assets", "lvis_synonyms.json")
    )


class LVISParser:
    """Match lemmatized LVIS synonyms inside the lemmatized caption.

    Mirrors the reference LVISParser contract: ``parse(sentence)`` returns
    (matched noun strings, 0-based LVIS category ids).
    """

    def __init__(self, vocab_path: str = None):
        with open(vocab_path or _default_lvis_path()) as f:
            cats = json.load(f)
        self.class_names: List[str] = [""] * len(cats)
        self.look_up: Dict[str, int] = {}
        for item in cats:
            cid = item["id"] - 1  # 0-based
            self.class_names[cid] = item["name"]
            for syn in item["synonyms"]:
                # the reference stops at a '(' token — parenthesized
                # qualifiers like "(computer_equipment)" are dropped from
                # the match key (parser.py:100-108)
                syn = syn.split("(")[0].lower().replace("_", " ")
                lemma = lemmatize_sentence(syn)
                if lemma:
                    self.look_up[lemma] = cid
        # longest-first so multiword synonyms are honored in matching
        self._patterns = sorted(self.look_up, key=len, reverse=True)

    @lru_cache(maxsize=200000)
    def parse(self, sentence: str) -> Tuple[Tuple[str, ...], Tuple[int, ...]]:
        lemma_sentence = " " + lemmatize_sentence(sentence) + " "
        nouns: List[str] = []
        ids: List[int] = []
        for pat in self._patterns:
            if f" {pat} " in lemma_sentence:
                nouns.append(pat)
                ids.append(self.look_up[pat])
        return tuple(nouns), tuple(ids)


# small public-domain English stopword list (fallback for POSParser)
_STOPWORDS = set(
    """a an the and or but if of at by for with about against between into
    through during before after above below to from up down in out on off
    over under again further then once here there when where why how all
    any both each few more most other some such no nor not only own same
    so than too very s t can will just don should now is are was were be
    been being have has had having do does did doing he she it its they
    them their this that these those i me my we our you your him his her
    while as until""".split()
)


class POSParser:
    """Noun extraction via POS tagging (reference NLTKParser).

    Uses NLTK when its tagger corpora are installed; otherwise falls back
    to LVIS vocabulary matching (which covers COCO object nouns).
    """

    def __init__(self, allowed_tags: Sequence[str] = ("NN", "NNS")):
        self.allowed_tags = tuple(allowed_tags)
        self._nltk_ok = False
        try:
            import nltk

            nltk.pos_tag(["test"])  # raises if corpora missing
            self._nltk = nltk
            self._nltk_ok = True
        except Exception:
            self._fallback = LVISParser()

    def parse(self, sentence: str) -> Tuple[Tuple[str, ...], Tuple[int, ...]]:
        if self._nltk_ok:
            words = [
                w
                for w in _WORD_RE.findall(sentence.lower())
                if w not in _STOPWORDS
            ]
            tagged = self._nltk.pos_tag(words)
            nouns = tuple(w for w, t in tagged if t in self.allowed_tags)
            return nouns, tuple(-1 for _ in nouns)
        return self._fallback.parse(sentence)


class ImageNet21KParser:
    """Match lemmatized ImageNet-21k class names inside captions
    (reference parser.py:28-82; unused by shipped configs, and the
    reference does not ship its ``imagenet-21k.txt`` asset either — pass
    the class-name file explicitly).

    ``parse(sentence)`` returns (matched names, 0-based class indices);
    with ``add_adj`` adjectives are appended like the reference's
    NLTK-POS pass (ids list stays aligned to matched class names only).
    """

    def __init__(self, class_names_file: str, add_adj: bool = False):
        if not os.path.exists(class_names_file):
            raise FileNotFoundError(
                f"ImageNet-21k class-name list not found: {class_names_file}"
                " (one class name per whitespace token, underscores for"
                " spaces — the reference repo does not ship this file)"
            )
        with open(class_names_file) as f:
            names = f.read().split()
        self.add_adj = add_adj
        self.class_names: List[str] = []
        self.look_up: Dict[str, int] = {}
        for i, name in enumerate(names):
            name = name.lower().replace("_", " ")
            self.class_names.append(name)
            # reference stops at a '(' token (parenthesized qualifiers)
            words = []
            for word in name.split():
                if word.startswith("("):
                    break
                words.append(lemmatize_word(word))
            lemma = " ".join(words).replace(" - ", "-")
            if lemma:
                self.look_up[lemma] = i
        self._patterns = sorted(self.look_up, key=len, reverse=True)
        # adjective tagging needs a real POS tagger; without NLTK corpora
        # the add_adj pass is skipped (the fallback tagger only knows nouns)
        self._adj_tagger = (
            POSParser(allowed_tags=("JJ", "JJR", "JJS"))
            if add_adj
            else None
        )

    @lru_cache(maxsize=200000)
    def parse(self, sentence: str) -> Tuple[Tuple[str, ...], Tuple[int, ...]]:
        lemma_sentence = " " + lemmatize_sentence(sentence) + " "
        nouns: List[str] = []
        ids: List[int] = []
        for pat in self._patterns:
            if f" {pat} " in lemma_sentence:
                nouns.append(pat)
                ids.append(self.look_up[pat])
        if self._adj_tagger is not None and self._adj_tagger._nltk_ok:
            adjs, _ = self._adj_tagger.parse(sentence)
            nouns.extend(a for a in adjs if a not in nouns)
        return tuple(nouns), tuple(ids)


def build_parser(kind: str = "lvis", **kwargs):
    if kind == "lvis":
        return LVISParser(**kwargs)
    if kind in ("nltk", "pos"):
        return POSParser(**kwargs)
    if kind == "imagenet21k":
        return ImageNet21KParser(**kwargs)
    raise ValueError(f"unknown parser kind {kind!r}")
