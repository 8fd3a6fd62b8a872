"""CQR — cell/pixel query result + set algebra.

Re-creation of the reference's CellQueryResult (SURVEY.md §1.1):
a sorted set of ``(pixel, fullMatch | partial item list)`` pairs with
lazily expanded full-match lists, supporting ``+ / - ^``, ``allToFull``
and ``flaten`` (include/hic/static-htm-index.h:276-287,
src/OscarSearchWithSg.cpp:188-201, apps/mainq.cpp:235,699).

Representation: parallel numpy arrays (sorted int64 pixels, bool fm)
plus a list of per-pixel doc arrays (None for full-match pixels).
Full-match expansion reads the pixel→docs postings store only when an
op needs concrete lists (difference/xor), like the reference expanding
fmTrixels through the ItemIndexStore.

Semantics (doc sets per pixel; ``P(x)`` = all docs of pixel x):
    union:      docs_a ∪ docs_b   (fm if either side fm)
    intersect:  docs_a ∩ docs_b   (fm iff both fm)
    difference: docs_a ∖ docs_b
    sym-diff:   docs_a △ docs_b
Pixels whose doc set becomes empty are dropped.  ``flaten`` unions all
per-pixel doc sets.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

Postings = Callable[[int], np.ndarray]  # pixel -> sorted doc ids


@dataclass
class CQR:
    pixels: np.ndarray  # int64, sorted ascending
    fm: np.ndarray      # bool
    items: list         # per-pixel np.ndarray (sorted) or None when fm
    postings: Postings = field(repr=False, default=None)

    # -- constructors ----------------------------------------------------
    @classmethod
    def empty(cls, postings: Postings = None) -> "CQR":
        return cls(np.empty(0, np.int64), np.empty(0, bool), [], postings)

    @classmethod
    def from_rows(cls, pixels, fm, items, postings: Postings = None) -> "CQR":
        pixels = np.asarray(pixels, dtype=np.int64)
        fm = np.asarray(fm, dtype=bool)
        order = np.argsort(pixels, kind="stable")
        items2 = [None if fm[i] else np.asarray(items[i], dtype=np.int64) for i in order]
        return cls(pixels[order], fm[order], items2, postings)

    # -- helpers ---------------------------------------------------------
    def _docs(self, i: int) -> np.ndarray:
        """Concrete doc list of slot i (expands full-match lazily)."""
        if self.fm[i]:
            return self.postings(int(self.pixels[i]))
        return self.items[i]

    def cell_count(self) -> int:
        return len(self.pixels)

    # -- ops (sorted two-pointer merges over pixel ids) ------------------
    def union(self, other: "CQR") -> "CQR":
        post = self.postings or other.postings
        pix, fm, items = [], [], []
        i = j = 0
        a, b = self, other
        while i < len(a.pixels) or j < len(b.pixels):
            pa_ = a.pixels[i] if i < len(a.pixels) else None
            pb = b.pixels[j] if j < len(b.pixels) else None
            if pb is None or (pa_ is not None and pa_ < pb):
                pix.append(pa_); fm.append(a.fm[i]); items.append(a.items[i]); i += 1
            elif pa_ is None or pb < pa_:
                pix.append(pb); fm.append(b.fm[j]); items.append(b.items[j]); j += 1
            else:
                f = bool(a.fm[i] or b.fm[j])
                pix.append(pa_); fm.append(f)
                items.append(None if f else np.union1d(a.items[i], b.items[j]))
                i += 1; j += 1
        return CQR(np.array(pix, np.int64), np.array(fm, bool), items, post)

    def intersect(self, other: "CQR") -> "CQR":
        post = self.postings or other.postings
        pix, fm, items = [], [], []
        common, ia, ib = np.intersect1d(self.pixels, other.pixels, return_indices=True)
        for p, i, j in zip(common, ia, ib):
            if self.fm[i] and other.fm[j]:
                pix.append(p); fm.append(True); items.append(None)
                continue
            if self.fm[i]:
                docs = other.items[j]
            elif other.fm[j]:
                docs = self.items[i]
            else:
                docs = np.intersect1d(self.items[i], other.items[j])
            if len(docs):
                pix.append(p); fm.append(False); items.append(docs)
        return CQR(np.array(pix, np.int64), np.array(fm, bool), items, post)

    def difference(self, other: "CQR") -> "CQR":
        post = self.postings or other.postings
        pix, fm, items = [], [], []
        bidx = {int(p): j for j, p in enumerate(other.pixels)}
        for i, p in enumerate(self.pixels):
            j = bidx.get(int(p))
            if j is None:
                pix.append(p); fm.append(self.fm[i]); items.append(self.items[i])
                continue
            if other.fm[j]:
                continue  # every doc of the pixel removed
            docs = np.setdiff1d(self._docs(i), other.items[j], assume_unique=True)
            if len(docs):
                pix.append(p); fm.append(False); items.append(docs)
        return CQR(np.array(pix, np.int64), np.array(fm, bool), items, post)

    def sym_diff(self, other: "CQR") -> "CQR":
        post = self.postings or other.postings
        pix, fm, items = [], [], []
        i = j = 0
        a, b = self, other
        while i < len(a.pixels) or j < len(b.pixels):
            pa_ = a.pixels[i] if i < len(a.pixels) else None
            pb = b.pixels[j] if j < len(b.pixels) else None
            if pb is None or (pa_ is not None and pa_ < pb):
                pix.append(pa_); fm.append(a.fm[i]); items.append(a.items[i]); i += 1
            elif pa_ is None or pb < pa_:
                pix.append(pb); fm.append(b.fm[j]); items.append(b.items[j]); j += 1
            else:
                docs = np.setxor1d(a._docs(i), b._docs(j), assume_unique=True)
                if len(docs):
                    pix.append(pa_); fm.append(False); items.append(docs)
                i += 1; j += 1
        return CQR(np.array(pix, np.int64), np.array(fm, bool), items, post)

    def all_to_full(self) -> "CQR":
        """FM_CONVERSION_OP: promote all partial pixels to full
        (static-htm-index.h:251-252)."""
        return CQR(self.pixels.copy(), np.ones(len(self.pixels), bool),
                   [None] * len(self.pixels), self.postings)

    def flaten(self) -> np.ndarray:
        """Union of all per-pixel doc sets → sorted doc ids
        (the reference spelling, apps/mainq.cpp:235)."""
        if not len(self.pixels):
            return np.empty(0, np.int64)
        parts = [self._docs(i) for i in range(len(self.pixels))]
        return np.unique(np.concatenate(parts))

    def apply(self, op: str, other: "CQR") -> "CQR":
        if op == "+":
            return self.union(other)
        if op in (" ", "/"):
            return self.intersect(other)
        if op == "-":
            return self.difference(other)
        if op == "^":
            return self.sym_diff(other)
        raise ValueError(f"unknown set op {op!r}")


class TreedCQR:
    """Lazy op-tree CQR — the reference's TreedCellQueryResult analogue
    (materialized by ``.toCQR(threadCount)``, src/static-htm-index.cpp:
    210-219; selected via the CQR-type template param,
    include/hic/static-htm-index.h:60-70,152-155).

    Ops build an expression tree in O(1); ``to_cqr()`` evaluates the
    whole tree at once.  Useful when many ops chain before a single
    flatten — intermediate CQRs never materialize."""

    def __init__(self, leaf: CQR | None = None, op: str | None = None,
                 operands: tuple = ()):
        self.leaf = leaf
        self.op = op
        self.operands = operands

    @classmethod
    def from_cqr(cls, cqr: CQR) -> "TreedCQR":
        return cls(leaf=cqr)

    def apply(self, op: str, other: "TreedCQR") -> "TreedCQR":
        if op == "^":
            pass  # supported for flat CQR; keep parity with CQR.apply
        return TreedCQR(op=op, operands=(self, other))

    def all_to_full(self) -> "TreedCQR":
        return TreedCQR(op="full", operands=(self,))

    def to_cqr(self) -> CQR:
        if self.leaf is not None:
            return self.leaf
        if self.op == "full":
            return self.operands[0].to_cqr().all_to_full()
        return self.operands[0].to_cqr().apply(self.op, self.operands[1].to_cqr())

    def flaten(self) -> np.ndarray:
        return self.to_cqr().flaten()
