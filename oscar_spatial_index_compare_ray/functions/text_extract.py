"""Deterministic HTML → text extraction.

North-rule per-row invariant: ``extract_text(html)`` must be
byte-identical per url across runs, processes and cluster sizes.  This
is the engine's analogue of the reference's item text payload (items
carry key/value strings, src/OscarSgIndex.cpp:102-130); here the text
comes out of a Common-Crawl-style ``html: binary`` column.

The extractor is a single pure function, versioned via
``EXTRACTOR_VERSION``; bump the version if the algorithm ever changes so
downstream indexes know their lineage.

Algorithm (simple, deterministic readability approximation):
  1. decode utf-8 (errors="replace" — still deterministic),
  2. drop <script>/<style> elements entirely,
  3. if a <main>...</main> element exists, keep only its inner HTML
     (boilerplate — nav, header, footer — lives outside <main>),
  4. strip all remaining tags,
  5. unescape the five standard XML/HTML entities,
  6. collapse runs of whitespace introduced by markup is NOT done —
     whitespace inside text nodes is preserved verbatim so extraction
     is invertible for generator-produced pages.

VERSION 2 (round 4): the decode moved from step 6 to step 1 so the
regex passes run in codepoint space with RE2-COMPATIBLE patterns (no
backreferences, no lookahead, ASCII word boundaries via ``re.ASCII``,
and — round 5 — case-insensitive tag names spelled as explicit ASCII
character classes rather than ``(?i)``, which RE2 would Unicode-case-
fold: '<ſcript>' must not match).  That makes the scalar spec and the
vectorized Arrow/RE2 batch stage (stages/extract.py,
``pc.replace_substring_regex`` chain) character-identical by
construction.  For VALID UTF-8 input the output is
byte-identical to version 1 — the patterns only anchor on ASCII
delimiters, which never occur inside UTF-8 multibyte sequences; inputs
with INVALID UTF-8 may differ from v1 (a bogus byte now becomes U+FFFD
before tag stripping instead of after), which is why the version bumped.
"""

from __future__ import annotations

import re

EXTRACTOR_VERSION = 2

# Shared pattern SOURCE strings — compiled by Python `re` here and run
# verbatim by Arrow/RE2 in stages/extract.py.  Constraints for parity:
# inline (?s) only, case-insensitivity spelled as EXPLICIT ASCII
# character classes — not (?i) — because RE2's (?i) applies Unicode
# simple case folding (U+017F 'ſ' folds to 's', so '<ſcript>' would
# match) while Python re.ASCII|re.I does not; explicit classes make
# the two engines identical by construction on ALL valid UTF-8
# (ADVICE r4).  No backreferences (the v1 `</\1>` is expanded into a
# per-tag alternation), no lookahead.
_SCRIPT = r"[sS][cC][rR][iI][pP][tT]"
_STYLE = r"[sS][tT][yY][lL][eE]"
_MAIN_W = r"[mM][aA][iI][nN]"
SCRIPT_STYLE_RE = (rf"(?s)<{_SCRIPT}\b.*?</{_SCRIPT}\s*>"
                   rf"|<{_STYLE}\b.*?</{_STYLE}\s*>")
MAIN_RE = rf"(?s)<{_MAIN_W}\b[^>]*>(?P<inner>.*?)</{_MAIN_W}\s*>"
TAG_RE = r"<[^>]*>"

ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # must be last
]

_SCRIPT_STYLE = re.compile(SCRIPT_STYLE_RE, re.ASCII)
_MAIN = re.compile(MAIN_RE, re.ASCII)
_TAG = re.compile(TAG_RE, re.ASCII)


def escape_text(text: str) -> bytes:
    """Inverse used by the synthetic generator: text → entity-escaped bytes."""
    b = text.encode("utf-8")
    b = b.replace(b"&", b"&amp;")
    b = b.replace(b"<", b"&lt;").replace(b">", b"&gt;")
    b = b.replace(b'"', b"&quot;").replace(b"'", b"&#39;")
    return b


def extract_text(html: bytes) -> str:
    """Pure, deterministic extraction; byte-stable per input."""
    if html is None:
        return ""
    body = html.decode("utf-8", errors="replace")
    body = _SCRIPT_STYLE.sub("", body)
    m = _MAIN.search(body)
    if m:
        body = m.group("inner")
    body = _TAG.sub("", body)
    for ent, ch in ENTITIES:
        body = body.replace(ent, ch)
    return body
