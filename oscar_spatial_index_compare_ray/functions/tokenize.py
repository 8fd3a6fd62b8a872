"""Tokenizer: text → terms.

The reference's corpus strings come out of the vendored
CellTextCompleter trie (src/OscarSearchSgIndex.cpp:492-506); queries are
unicode-lowercased when the index is case-insensitive
(src/OscarSearchWithSg.cpp:56-62).  The engine's tokenizer is the single
place that defines term identity.

Term identity is defined ONCE, by the vectorized Arrow/RE2 kernel:
``utf8_lower`` + split on ``TOKEN_SPLIT_RE`` (``[^\\p{L}\\p{N}_]+`` —
Unicode letters/digits/underscore are word characters, everything else
separates).  The scalar ``tokenize()`` DELEGATES to the same Arrow
kernel on a one-element array, so scalar and batch paths are
byte-identical by construction, including on non-ASCII text (round-3
ADVICE: the old scalar path used Python ``\\w+`` + ``str.casefold``,
which diverged from the RE2 batch kernels on anything non-ASCII).

The DuckDB oracle mirrors it exactly — DuckDB regexps are RE2 too:
``list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}_]+'),
x -> x <> '')``.  Parity across all three (scalar / Arrow batch /
DuckDB) is pytest-asserted on non-ASCII samples.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# The ONE pattern defining term boundaries (RE2 syntax, shared verbatim
# by every Arrow kernel and every DuckDB oracle SQL string).
TOKEN_SPLIT_RE = r"[^\p{L}\p{N}_]+"


def normalize_term(t: str) -> str:
    """Query-side term normalization — the same utf8_lower the index
    build uses (NOT str.casefold: 'Straße' → 'straße', not 'strasse')."""
    return pc.utf8_lower(pa.scalar(t, pa.string())).as_py()


def tokenize(text: str) -> list[str]:
    """All tokens, lowercased, in order (with duplicates).

    Delegates to the Arrow kernel so the scalar spec and the vectorized
    map_batches paths can never diverge."""
    if not text:
        return []
    lists = pc.split_pattern_regex(
        pc.utf8_lower(pa.array([text], pa.string())), TOKEN_SPLIT_RE
    )
    return [t for t in lists[0].as_py() if t]


def unique_terms(text: str) -> list[str]:
    """Distinct tokens, sorted — the per-document term set."""
    return sorted(set(tokenize(text)))


# GPT-2-style pretokenizer pattern: contractions, words, numbers,
# punctuation runs, whitespace runs — the "BPE-ish" token counter for
# training-data budgeting (counts pretokens, the unit BPE merges over).
#
# Scope note (round-3 ADVICE): ``\s`` here is Python/Unicode whitespace;
# the vectorized twin (pipelines/traindata.py q_token_count_bpe) and its
# SQL oracle use RE2 ``\s`` which is ASCII-only, so non-ASCII whitespace
# (U+00A0, U+2009, …) counts as a punctuation pretoken there but is
# excluded here.  The differential test pins the ASCII-whitespace scope.
_BPE_ISH_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)


def bpe_ish_token_count(text: str) -> int:
    """Approximate LLM token count: GPT-2-style pretokens (whitespace +
    punctuation aware), no merges.  Deterministic, pure."""
    if not text:
        return 0
    return sum(1 for m in _BPE_ISH_RE.finditer(text) if not m.group().isspace())
