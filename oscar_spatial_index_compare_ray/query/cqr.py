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


def _seg_setop_flat(A, sa, B, sb, op: str):
    """Per-segment set ops over FLAT (docs, segment-id) pairs — each
    side sorted-unique WITHIN a segment — vectorized: ONE lexsort over
    the concatenation instead of a numpy set call per segment.

    With tens of thousands of common pixels per heavy query, per-pixel
    ``np.setdiff1d``/``setxor1d`` calls are pure fixed overhead (~10 µs
    each); measured on the 200k-page index heavy battery the flat
    kernel chain takes `a ^ b` from 5.1 s to <1 s (BASELINE.md
    round-5 section).

    Pairing trick: each side is unique within a segment, so after
    sorting by (segment, doc) a doc present on BOTH sides appears as an
    adjacent equal pair; presence/absence of that pair is exactly the
    membership test every set op needs.

    Returns (docs, seg) of the result, sorted by (seg, doc).
    """
    docs = np.concatenate([A, B])
    seg = np.concatenate([sa, sb])
    from_a = np.zeros(len(docs), bool)
    from_a[: len(A)] = True
    if len(docs):
        dmax, dmin, smax = int(docs.max()), int(docs.min()), int(seg.max())
    else:
        dmax = dmin = smax = 0
    if dmin >= 0 and (smax + 1) * (dmax + 1) < (1 << 63):
        # (seg, doc) packs injectively into one int64 → a single
        # argsort, ~4× cheaper than lexsort on two key arrays
        order = np.argsort(seg * np.int64(dmax + 1) + docs)
    else:  # pragma: no cover - doc ids beyond 2^63/segs
        order = np.lexsort((docs, seg))
    d, s, fa = docs[order], seg[order], from_a[order]
    same_next = np.zeros(len(d), bool)
    if len(d) > 1:
        same_next[:-1] = (d[:-1] == d[1:]) & (s[:-1] == s[1:])
    paired = same_next.copy()
    paired[1:] |= same_next[:-1]
    if op == "+":
        keep = ~paired | fa          # singles + the A copy of each pair
    elif op in (" ", "/"):
        keep = paired & fa           # one copy per pair
    elif op == "-":
        keep = fa & ~paired          # A docs with no B twin
    elif op == "^":
        keep = ~paired               # docs on exactly one side
    else:  # pragma: no cover
        raise ValueError(f"unknown set op {op!r}")
    return d[keep], s[keep]


def _split_runs(d2, s2):
    """(seg ids present, list of per-seg doc views) from a flat result
    sorted by seg — only NONEMPTY segments produce entries, so no
    ``np.split`` over 10⁵ mostly-empty cuts (np.split's per-part
    swapaxes was 1.3 s of a 5.3 s sym_diff before this)."""
    if not len(s2):
        return np.empty(0, np.int64), []
    bounds = np.nonzero(np.diff(s2))[0] + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(s2)]])
    return s2[starts], [d2[lo:hi] for lo, hi in zip(starts, ends)]


def _items_flat(items: list, idx_map, pm):
    """Flat (docs, seg) view of ``items[idx_map[k]] for k in pm`` with
    seg ids = the k values themselves (need not be contiguous — the
    kernel only groups by equal seg)."""
    if not len(pm):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    lens = np.fromiter((len(items[idx_map[k]]) for k in pm), np.int64, len(pm))
    if not int(lens.sum()):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    docs = np.concatenate([items[idx_map[k]] for k in pm])
    return docs, np.repeat(np.asarray(pm, np.int64), lens)


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

    def _docs_flat(self, idxs):
        """Flat (docs, seg) over the given slots, seg = position within
        ``idxs``; fm rows expand through the postings store's BULK
        counts path (one variable-length gather per covering row group
        — no per-pixel array objects at all)."""
        idxs = np.asarray(idxs, np.int64)
        fmm = self.fm[idxs]
        fm_pos = np.nonzero(fmm)[0]
        pm_pos = np.nonzero(~fmm)[0]
        parts, segs = [], []
        if len(fm_pos):
            p = self.pixels[idxs[fm_pos]]
            if hasattr(self.postings, "many_counts"):
                vals, counts = self.postings.many_counts(p)
            else:
                arrs = [self.postings(int(x)) for x in p]
                counts = np.fromiter((len(x) for x in arrs), np.int64,
                                     len(arrs))
                vals = np.concatenate(arrs) if arrs else np.empty(0, np.int64)
            parts.append(vals)
            segs.append(np.repeat(fm_pos, counts))
        if len(pm_pos):
            docs, seg = _items_flat(self.items, idxs, pm_pos)
            parts.append(docs)
            segs.append(seg)
        if not parts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(parts), np.concatenate(segs)

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
        fm_any = a.fm[ia] | b.fm[ib]
        pix_parts = [a.pixels[only_a], b.pixels[only_b], common]
        fm_parts = [a.fm[only_a], b.fm[only_b], fm_any]
        items = [a.items[i] for i in np.nonzero(only_a)[0]]
        items += [b.items[j] for j in np.nonzero(only_b)[0]]
        c_items: list = [None] * len(common)
        pm = np.nonzero(~fm_any)[0]
        A, sa = _items_flat(a.items, ia, pm)
        B, sb = _items_flat(b.items, ib, pm)
        for k, arr in zip(*_split_runs(*_seg_setop_flat(A, sa, B, sb, "+"))):
            c_items[k] = arr
        items += c_items
        pix = np.concatenate(pix_parts)
        fm = np.concatenate(fm_parts)
        order = np.argsort(pix, kind="stable")
        return CQR(pix[order], fm[order], [items[k] for k in order], post)

    def intersect(self, other: "CQR") -> "CQR":
        post = self.postings or other.postings
        common, ia, ib = np.intersect1d(self.pixels, other.pixels, return_indices=True)
        afm, bfm = self.fm[ia], other.fm[ib]
        docs_list: list = [None] * len(common)
        pm = np.nonzero(~afm & ~bfm)[0]
        A, sa = _items_flat(self.items, ia, pm)
        B, sb = _items_flat(other.items, ib, pm)
        for k, arr in zip(*_split_runs(*_seg_setop_flat(A, sa, B, sb, "/"))):
            docs_list[k] = arr
        pix, fm, items = [], [], []
        for k in range(len(common)):
            if afm[k] and bfm[k]:
                pix.append(common[k]); fm.append(True); items.append(None)
            elif afm[k]:
                pix.append(common[k]); fm.append(False); items.append(other.items[ib[k]])
            elif bfm[k]:
                pix.append(common[k]); fm.append(False); items.append(self.items[ia[k]])
            elif docs_list[k] is not None and len(docs_list[k]):
                pix.append(common[k]); fm.append(False); items.append(docs_list[k])
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
        # pixels fully removed by a full-match b side never need expansion
        c_keep = np.nonzero(~b.fm[ib])[0]
        A, sa = a._docs_flat(ia[c_keep])   # seg = position within c_keep
        B, sb = _items_flat(b.items, ib[c_keep], np.arange(len(c_keep)))
        for q, docs in zip(*_split_runs(*_seg_setop_flat(A, sa, B, sb, "-"))):
            c_pix.append(common[c_keep[q]]); c_items.append(docs)
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
        A, sa = a._docs_flat(ia)
        B, sb = b._docs_flat(ib)
        for k, docs in zip(*_split_runs(*_seg_setop_flat(A, sa, B, sb, "^"))):
            c_pix.append(common[k]); c_items.append(docs)
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
