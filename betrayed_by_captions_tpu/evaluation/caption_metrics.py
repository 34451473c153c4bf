"""Caption metrics: BLEU-1..4, CIDEr-D, ROUGE-L (clean-room numpy).

Replaces the reference's vendored coco-caption scorers
(open_set/utils/eval/caption/{bleu,cider,rouge}; used by the dataset's
caption evaluation, open_set/datasets/coco_open.py:745-781). Implemented
from the published metric definitions:

- BLEU: corpus-level modified n-gram precision with brevity penalty,
  'closest' reference-length option (coco-caption default),
- CIDEr-D: TF-IDF 1-4-gram cosine similarity with count clipping and a
  gaussian length penalty (sigma=6), scaled by 10,
- ROUGE-L: LCS F-measure with beta=1.2, max over references.

Tokenization: lowercase + punctuation-stripped whitespace tokens
(standing in for the Java PTB tokenizer, which is unavailable).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence, Tuple

_TOKEN_RE = re.compile(r"[a-z0-9]+(?:'[a-z0-9]+)?")


def tokenize(text: str) -> List[str]:
    return _TOKEN_RE.findall(text.lower())


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


# ------------------------------------------------------------------- BLEU


def bleu_score(
    candidates: Dict[str, str],
    references: Dict[str, Sequence[str]],
    max_n: int = 4,
) -> List[float]:
    """Corpus BLEU-1..max_n. Keys of the two dicts must match."""
    num = [0.0] * max_n
    den = [0.0] * max_n
    cand_len = 0
    ref_len = 0
    for key, cand in candidates.items():
        cand_toks = tokenize(cand)
        ref_toks = [tokenize(r) for r in references[key]]
        cand_len += len(cand_toks)
        # 'closest' reference length (ties -> shorter)
        ref_len += min(
            (abs(len(r) - len(cand_toks)), len(r)) for r in ref_toks
        )[1]
        for n in range(1, max_n + 1):
            c_ngrams = _ngrams(cand_toks, n)
            max_ref = Counter()
            for r in ref_toks:
                for g, cnt in _ngrams(r, n).items():
                    max_ref[g] = max(max_ref[g], cnt)
            clipped = sum(min(cnt, max_ref[g]) for g, cnt in c_ngrams.items())
            num[n - 1] += clipped
            den[n - 1] += max(sum(c_ngrams.values()), 0)

    bp = 1.0 if cand_len > ref_len else math.exp(1 - ref_len / max(cand_len, 1))
    scores = []
    log_sum = 0.0
    for n in range(max_n):
        p = num[n] / den[n] if den[n] > 0 else 0.0
        # tiny smoothing like coco-caption (avoids log 0)
        log_sum += math.log(max(p, 1e-12))
        scores.append(bp * math.exp(log_sum / (n + 1)))
    return scores


# ----------------------------------------------------------------- CIDEr-D


def cider_d_score(
    candidates: Dict[str, str],
    references: Dict[str, Sequence[str]],
    max_n: int = 4,
    sigma: float = 6.0,
) -> float:
    """Corpus CIDEr-D (mean over images of the per-image score)."""
    # document frequencies over reference sets
    doc_freq = [defaultdict(int) for _ in range(max_n)]
    for refs in references.values():
        for n in range(1, max_n + 1):
            seen = set()
            for r in refs:
                seen |= set(_ngrams(tokenize(r), n).keys())
            for g in seen:
                doc_freq[n - 1][g] += 1
    log_num_imgs = math.log(max(len(references), 1))

    def tfidf(tokens: List[str], n: int) -> Tuple[Dict, float, int]:
        counts = _ngrams(tokens, n)
        vec = {}
        norm_sq = 0.0
        for g, cnt in counts.items():
            df = math.log(max(doc_freq[n - 1][g], 1))
            w = cnt * max(log_num_imgs - df, 0.0)
            vec[g] = w
            norm_sq += w * w
        return vec, math.sqrt(norm_sq), len(tokens)

    total = 0.0
    for key, cand in candidates.items():
        cand_toks = tokenize(cand)
        score_n = [0.0] * max_n
        for ref in references[key]:
            ref_toks = tokenize(ref)
            delta = len(cand_toks) - len(ref_toks)
            penalty = math.exp(-(delta ** 2) / (2 * sigma ** 2))
            for n in range(1, max_n + 1):
                cv, cn, _ = tfidf(cand_toks, n)
                rv, rn, _ = tfidf(ref_toks, n)
                # CIDEr-D clips candidate counts at reference counts
                dot = sum(min(w, rv.get(g, 0.0)) * rv.get(g, 0.0) for g, w in cv.items())
                if cn > 0 and rn > 0:
                    score_n[n - 1] += penalty * dot / (cn * rn)
        num_refs = max(len(references[key]), 1)
        total += 10.0 * sum(score_n) / (max_n * num_refs)
    return total / max(len(candidates), 1)


# ----------------------------------------------------------------- ROUGE-L


def _lcs_length(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def rouge_l_score(
    candidates: Dict[str, str],
    references: Dict[str, Sequence[str]],
    beta: float = 1.2,
) -> float:
    """Corpus ROUGE-L: mean over images of max-over-refs LCS F-measure."""
    total = 0.0
    for key, cand in candidates.items():
        cand_toks = tokenize(cand)
        best = 0.0
        for ref in references[key]:
            ref_toks = tokenize(ref)
            lcs = _lcs_length(cand_toks, ref_toks)
            prec = lcs / len(cand_toks) if cand_toks else 0.0
            rec = lcs / len(ref_toks) if ref_toks else 0.0
            if prec > 0 and rec > 0:
                f = ((1 + beta ** 2) * prec * rec) / (rec + beta ** 2 * prec)
            else:
                f = 0.0
            best = max(best, f)
        total += best
    return total / max(len(candidates), 1)


def evaluate_captions(
    candidates: Dict[str, str], references: Dict[str, Sequence[str]]
) -> Dict[str, float]:
    """All caption metrics (reference coco_open.py:745-781 protocol)."""
    bleu = bleu_score(candidates, references)
    return {
        "Bleu_1": bleu[0],
        "Bleu_2": bleu[1],
        "Bleu_3": bleu[2],
        "Bleu_4": bleu[3],
        "CIDEr": cider_d_score(candidates, references),
        "ROUGE_L": rouge_l_score(candidates, references),
    }
