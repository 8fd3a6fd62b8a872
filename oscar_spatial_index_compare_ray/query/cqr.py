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

    def _docs_many(self, idxs) -> list:
        """Aligned doc arrays for the given slots; fm rows expand via
        the postings store's BULK split path when available."""
        idxs = np.asarray(idxs, np.int64)
        out: list = [None] * len(idxs)
        fm_pos = [k for k in range(len(idxs)) if self.fm[idxs[k]]]
        if fm_pos and hasattr(self.postings, "many_split"):
            arrs = self.postings.many_split(
                self.pixels[idxs[np.array(fm_pos, np.int64)]]
            )
            for k, arr in zip(fm_pos, arrs):
                out[k] = arr
        else:
            for k in fm_pos:
                out[k] = self.postings(int(self.pixels[idxs[k]]))
        for k in range(len(idxs)):
            if out[k] is None:
                out[k] = self.items[idxs[k]]
        return out

    def cell_count(self) -> int:
        return len(self.pixels)

    # -- ops (vectorized pixel-set skeletons; Python only touches the
    #    COMMON pixels' per-pixel doc-set math) --------------------------
    def union(self, other: "CQR") -> "CQR":
        post = self.postings or other.postings
        a, b = self, other
        common, ia, ib = np.intersect1d(a.pixels, b.pixels, return_indices=True)
        only_a = np.ones(len(a.pixels), bool); only_a[ia] = False
        only_b = np.ones(len(b.pixels), bool); only_b[ib] = False
        pix_parts = [a.pixels[only_a], b.pixels[only_b], common]
        fm_parts = [a.fm[only_a], b.fm[only_b], a.fm[ia] | b.fm[ib]]
        items = [a.items[i] for i in np.nonzero(only_a)[0]]
        items += [b.items[j] for j in np.nonzero(only_b)[0]]
        for i, j in zip(ia, ib):
            items.append(
                None if (a.fm[i] or b.fm[j]) else np.union1d(a.items[i], b.items[j])
            )
        pix = np.concatenate(pix_parts)
        fm = np.concatenate(fm_parts)
        order = np.argsort(pix, kind="stable")
        return CQR(pix[order], fm[order], [items[k] for k in order], post)

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
        a, b = self, other
        common, ia, ib = np.intersect1d(a.pixels, b.pixels, return_indices=True)
        only_a = np.ones(len(a.pixels), bool); only_a[ia] = False
        keep_a = np.nonzero(only_a)[0]
        pix = [a.pixels[keep_a]]
        fm = [a.fm[keep_a]]
        items = [a.items[i] for i in keep_a]
        c_pix, c_items = [], []
        a_docs = a._docs_many(ia)  # bulk fm expansion, aligned with ia
        for k, (i, j) in enumerate(zip(ia, ib)):
            if b.fm[j]:
                continue  # every doc of the pixel removed
            docs = np.setdiff1d(a_docs[k], b.items[j], assume_unique=True)
            if len(docs):
                c_pix.append(a.pixels[i]); c_items.append(docs)
        pix.append(np.array(c_pix, np.int64))
        fm.append(np.zeros(len(c_pix), bool))
        items += c_items
        pixc = np.concatenate(pix)
        fmc = np.concatenate(fm)
        order = np.argsort(pixc, kind="stable")
        return CQR(pixc[order], fmc[order], [items[k] for k in order], post)

    def sym_diff(self, other: "CQR") -> "CQR":
        post = self.postings or other.postings
        a, b = self, other
        common, ia, ib = np.intersect1d(a.pixels, b.pixels, return_indices=True)
        only_a = np.ones(len(a.pixels), bool); only_a[ia] = False
        only_b = np.ones(len(b.pixels), bool); only_b[ib] = False
        ka, kb = np.nonzero(only_a)[0], np.nonzero(only_b)[0]
        pix = [a.pixels[ka], b.pixels[kb]]
        fm = [a.fm[ka], b.fm[kb]]
        items = [a.items[i] for i in ka] + [b.items[j] for j in kb]
        c_pix, c_items = [], []
        a_docs = a._docs_many(ia)
        b_docs = b._docs_many(ib)
        for k, (i, j) in enumerate(zip(ia, ib)):
            docs = np.setxor1d(a_docs[k], b_docs[k], assume_unique=True)
            if len(docs):
                c_pix.append(a.pixels[i]); c_items.append(docs)
        pix.append(np.array(c_pix, np.int64))
        fm.append(np.zeros(len(c_pix), bool))
        items += c_items
        pixc = np.concatenate(pix)
        fmc = np.concatenate(fm)
        order = np.argsort(pixc, kind="stable")
        return CQR(pixc[order], fmc[order], [items[k] for k in order], post)

    def all_to_full(self) -> "CQR":
        """FM_CONVERSION_OP: promote all partial pixels to full
        (static-htm-index.h:251-252)."""
        return CQR(self.pixels.copy(), np.ones(len(self.pixels), bool),
                   [None] * len(self.pixels), self.postings)

    def flaten(self) -> np.ndarray:
        """Union of all per-pixel doc sets → sorted doc ids
        (the reference spelling, apps/mainq.cpp:235).

        Full-match pixels expand through the postings store's BULK path
        when available (``postings.many``): one vectorized gather per
        covering row group instead of 10⁵ per-pixel lookups at scale."""
        if not len(self.pixels):
            return np.empty(0, np.int64)
        parts = [self.items[i] for i in np.nonzero(~self.fm)[0]]
        fm_pix = self.pixels[self.fm]
        if len(fm_pix):
            if hasattr(self.postings, "many"):
                parts.append(self.postings.many(fm_pix))
            else:
                parts.extend(self.postings(int(p)) for p in fm_pix)
        if not parts:
            return np.empty(0, np.int64)
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
