"""Text-analysis kernels for the large-scale training-data pipeline:
language-ID (n-gram/stopword heuristic), quality scoring, token
counting, document fingerprinting (winnowing rolling hash).

These extend the reference's text handling (its corpus strings feed a
trie, src/OscarSearchSgIndex.cpp:492-506) with the operations a 100 TB
web-text pipeline needs.  All kernels are pure and deterministic.
"""

from __future__ import annotations

import numpy as np

from .hashing import token_hashes
from .tokenize import tokenize

# tiny stopword profiles (top function words) per language
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is it you that was for on are with".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist".split()),
    "fr": frozenset("le la de et les des en un du une que est pour".split()),
    "es": frozenset("de la que el en y a los del se las un por".split()),
    "it": frozenset("di e il la che in a per del un con non una".split()),
}

PUNCT = set(".,;:!?\"'()[]{}<>-")


def lang_id(text: str) -> tuple[str, float]:
    """Heuristic language-ID: stopword-profile hit rates.  Returns
    (lang, confidence); 'und' when nothing matches (short/garbage)."""
    toks = tokenize(text)
    if not toks:
        return "und", 0.0
    scores = {
        lang: sum(t in sw for t in toks) / len(toks) for lang, sw in STOPWORDS.items()
    }
    best = max(scores, key=lambda k: (scores[k], k))
    if scores[best] == 0.0:
        return "und", 0.0
    return best, round(scores[best], 6)


def token_count(text: str) -> int:
    return len(tokenize(text))


def quality_stats(text: str) -> dict:
    """Per-document quality signals (length / punctuation / stopword /
    repetition ratios) — the usual web-text filtering features."""
    if not text:
        return {
            "n_chars": 0, "n_tokens": 0, "n_unique_tokens": 0,
            "mean_token_len": 0.0, "punct_ratio": 0.0,
            "stopword_ratio": 0.0, "repetition_ratio": 0.0,
        }
    toks = tokenize(text)
    n = len(toks)
    uniq = len(set(toks))
    n_punct = sum(c in PUNCT for c in text)
    sw = STOPWORDS["en"]
    return {
        "n_chars": len(text),
        "n_tokens": n,
        "n_unique_tokens": uniq,
        "mean_token_len": round(sum(map(len, toks)) / n, 6) if n else 0.0,
        "punct_ratio": round(n_punct / len(text), 6),
        "stopword_ratio": round(sum(t in sw for t in toks) / n, 6) if n else 0.0,
        "repetition_ratio": round(1.0 - uniq / n, 6) if n else 0.0,
    }


def fingerprint(text: str, k: int = 5, window: int = 8) -> np.ndarray:
    """Winnowing fingerprint (Schleimer et al. 2003): k-token shingle
    hashes, per-window minimum, deduplicated — a compact, robust
    document signature for copy detection."""
    toks = tokenize(text)
    if len(toks) < k:
        h = token_hashes(toks)
        return np.unique(h)
    th = token_hashes(toks)
    # rolling k-shingle hash: combine k consecutive token hashes
    sh = th[: len(th) - k + 1].copy()
    for i in range(1, k):
        sh = sh * np.uint64(1099511628211) ^ th[i: len(th) - k + 1 + i]
    if len(sh) <= window:
        return np.unique(sh)
    # sliding-window minima (vectorized via stride trick)
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(sh, window).min(axis=1)
    return np.unique(mins)
