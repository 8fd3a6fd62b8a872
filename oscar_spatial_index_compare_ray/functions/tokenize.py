"""Tokenizer: text → terms.

The reference's corpus strings come out of the vendored
CellTextCompleter trie (src/OscarSearchSgIndex.cpp:492-506); queries are
unicode-lowercased when the index is case-insensitive
(src/OscarSearchWithSg.cpp:56-62).  The engine's tokenizer is the single
place that defines term identity: lowercase (str.casefold for unicode
correctness), ``\\w+`` word characters.

Kept deliberately tiny and pure so the DuckDB oracle can mirror it:
``list_distinct(regexp_split_to_array(lower(text), '\\W+'))`` modulo
casefold-vs-lower differences, which the synthetic corpora avoid.
"""

from __future__ import annotations

import re

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def normalize_term(t: str) -> str:
    return t.casefold()


def tokenize(text: str) -> list[str]:
    """All tokens, lowercased, in order (with duplicates)."""
    if not text:
        return []
    return [t.casefold() for t in _WORD_RE.findall(text)]


def unique_terms(text: str) -> list[str]:
    """Distinct tokens, sorted — the per-document term set."""
    return sorted(set(tokenize(text)))


# GPT-2-style pretokenizer pattern: contractions, words, numbers,
# punctuation runs, whitespace runs — the "BPE-ish" token counter for
# training-data budgeting (counts pretokens, the unit BPE merges over).
_BPE_ISH_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)


def bpe_ish_token_count(text: str) -> int:
    """Approximate LLM token count: GPT-2-style pretokens (whitespace +
    punctuation aware), no merges.  Deterministic, pure."""
    if not text:
        return 0
    return sum(1 for m in _BPE_ISH_RE.finditer(text) if not m.group().isspace())
