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
"""

from __future__ import annotations

import re

EXTRACTOR_VERSION = 1

_SCRIPT_RE = re.compile(rb"<(script|style)\b.*?</\1\s*>", re.S | re.I)
_MAIN_RE = re.compile(rb"<main\b[^>]*>(.*?)</main\s*>", re.S | re.I)
_TAG_RE = re.compile(rb"<[^>]*>")

_ENTITIES = [
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
    (b"&amp;", b"&"),  # must be last
]


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
    body = _SCRIPT_RE.sub(b"", html)
    m = _MAIN_RE.search(body)
    if m:
        body = m.group(1)
    body = _TAG_RE.sub(b"", body)
    for ent, ch in _ENTITIES:
        body = body.replace(ent, ch)
    return body.decode("utf-8", errors="replace")
