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
