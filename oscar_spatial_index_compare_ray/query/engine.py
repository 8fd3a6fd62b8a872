"""Query engine: AST → CQR → flattened doc ids.

Re-creation of the reference's three AST interpreters
(SgOpTree::Calc::calc include/hic/static-htm-index.h:197-299,
OscarSearchWithSg::process src/OscarSearchWithSg.cpp:110-213,
HcqrOpTree::Calc::calc src/HcqrOpTree.cpp:17-153) over the engine's
text_index / postings / trixel tables.

The engine state is the analogue of the reference's mmap'd static index
(trie + payload arrays + ItemIndexStore): small derived tables loaded
into worker memory.  At 100 TB these tables are partitioned parquet and
the engine runs as an actor pool with per-term predicate-pushdown reads
(terms sorted → parquet row-group stats prune); the in-memory layout
here is the same dict-of-arrays the actors would hold per term shard.

Query-type support + fallback mirrors src/static-htm-index.cpp:82-106:
a requested type missing from ``supported_qts`` falls back
SUBSTRING→PREFIX→SUFFIX→EXACT, PREFIX→EXACT, SUFFIX→EXACT.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa

from ..grids import get_grid
from ..stages.pip import PolygonIndex
from .cqr import CQR
from .parser import (
    AllToFull,
    CellLeaf,
    Dilate,
    NearLeaf,
    Node,
    ParseError,
    PointLeaf,
    PolyLeaf,
    RectLeaf,
    RegionLeaf,
    SetOp,
    TermLeaf,
    parse,
)

_FALLBACK = {
    "substring": ("substring", "prefix", "suffix", "exact"),
    "prefix": ("prefix", "exact"),
    "suffix": ("suffix", "exact"),
    "exact": ("exact",),
}


class QueryEngine:
    def __init__(
        self,
        text_index: pa.Table,          # term, pixel, fm, n, items
        postings: pa.Table,            # pixel, items
        trixel_data: pa.Table,         # pixel(<grid>_cell), cell_id, items
        points: pa.Table,              # doc_id, point_idx, lat, lon, pixel
        cells_regions: pa.Table,       # cell_id, region_id
        region_names: pa.Table,        # region_id, name
        grid_name: str = "h3",
        level: int = 8,
        supported_qts: tuple[str, ...] = ("exact", "prefix", "suffix", "substring"),
    ):
        self.grid = get_grid(grid_name, default_level=level)
        self.level = level
        self.supported_qts = supported_qts

        # postings: pixel -> sorted docs
        self._postings: dict[int, np.ndarray] = {}
        for pix, items in zip(
            postings.column("pixel").to_pylist(), postings.column("items").to_pylist()
        ):
            self._postings[int(pix)] = np.asarray(items, dtype=np.int64)

        # term -> (pixels, fm, items)
        self._terms: dict[str, tuple[np.ndarray, np.ndarray, list]] = {}
        t = text_index
        terms = t.column("term").to_pylist()
        pixs = t.column("pixel").to_numpy(zero_copy_only=False)
        fms = t.column("fm").to_numpy(zero_copy_only=False)
        item_lists = t.column("items").to_pylist()
        order = np.argsort(np.asarray(terms, dtype=object), kind="stable")
        cur = None
        for i in order:
            term = terms[i]
            if term != cur:
                self._terms[term] = ([], [], [])
                cur = term
            e = self._terms[term]
            e[0].append(pixs[i])
            e[1].append(fms[i])
            # fm rows carry empty/absent item lists (reconstructed from
            # postings on demand)
            e[2].append(
                None if (fms[i] or item_lists[i] is None)
                else np.asarray(item_lists[i], np.int64)
            )
        for term, (p, f, it) in self._terms.items():
            self._terms[term] = (np.asarray(p, np.int64), np.asarray(f, bool), it)
        self._vocab = np.array(sorted(self._terms), dtype=object)

        # cell -> [(pixel, docs)]
        self._cells: dict[int, list[tuple[int, np.ndarray]]] = {}
        pcol = [c for c in trixel_data.column_names if c.endswith("_cell")][0]
        for pix, cid, items in zip(
            trixel_data.column(pcol).to_pylist(),
            trixel_data.column("cell_id").to_pylist(),
            trixel_data.column("items").to_pylist(),
        ):
            self._cells.setdefault(int(cid), []).append(
                (int(pix), np.asarray(items, np.int64))
            )

        # region name -> cell ids
        name_of = dict(
            zip(region_names.column("region_id").to_pylist(),
                region_names.column("name").to_pylist())
        )
        self._region_cells: dict[str, list[int]] = {}
        for cid, rid in zip(
            cells_regions.column("cell_id").to_pylist(),
            cells_regions.column("region_id").to_pylist(),
        ):
            nm = name_of.get(rid)
            if nm is not None:
                self._region_cells.setdefault(nm, []).append(int(cid))

        # points (for geometry-exact leaves and kNN)
        self._pt_doc = points.column("doc_id").to_numpy(zero_copy_only=False)
        self._pt_lat = points.column("lat").to_numpy(zero_copy_only=False)
        self._pt_lon = points.column("lon").to_numpy(zero_copy_only=False)
        pix_col = [c for c in points.column_names if c.endswith("_cell") or c == "pixel"][0]
        self._pt_pix = points.column(pix_col).to_numpy(zero_copy_only=False)

    # -- cell-info interface (OscarSearchSgIndexCellInfo analogue,
    #    include/hic/OscarSearchWithSg.h:10-26) --------------------------
    def cell_size(self) -> int:
        """Number of populated pixels (cellSize())."""
        return len(self._postings)

    def cell_boundary(self, pixel: int) -> tuple[float, float, float, float]:
        """(lat0, lat1, lon0, lon1) of one pixel (cellBoundary())."""
        la0, la1, lo0, lo1 = self.grid.bbox(
            np.array([pixel], dtype=np.int64).view(np.uint64)
        )
        return float(la0[0]), float(la1[0]), float(lo0[0]), float(lo1[0])

    def cell_items_count(self, pixel: int) -> int:
        """Docs in one pixel (cellItemsCount())."""
        return len(self._post(pixel))

    def cell_items(self, pixel: int) -> np.ndarray:
        """The pixel's posting list (cellItemsPtr() dereferenced)."""
        return self._post(pixel)

    # ------------------------------------------------------------------
    def _post(self, pixel: int) -> np.ndarray:
        return self._postings.get(int(pixel), np.empty(0, np.int64))

    def _cqr_from_rows(self, pixels, fm, items) -> CQR:
        return CQR.from_rows(pixels, fm, items, self._post)

    def _empty(self) -> CQR:
        return CQR.empty(self._post)

    # -- term leaves -----------------------------------------------------
    def _matching_terms(self, value: str, qt: str) -> list[str]:
        if not value:
            return []
        for eff in _FALLBACK[qt]:
            if eff in self.supported_qts:
                qt = eff
                break
        else:
            return []
        if qt == "exact":
            return [value] if value in self._terms else []
        if qt == "prefix":
            lo = np.searchsorted(self._vocab, value)
            # chr(0x10FFFF): upper bound must sort above supplementary-
            # plane characters too (U+FFFF alone misses terms > BMP)
            hi = np.searchsorted(self._vocab, value + chr(0x10FFFF))
            return list(self._vocab[lo:hi])
        if qt == "suffix":
            return [t for t in self._terms if t.endswith(value)]
        return [t for t in self._terms if value in t]  # substring

    def _union_pixel_rows(self, rows: list[tuple[np.ndarray, np.ndarray, list]]) -> CQR:
        """Union many per-term row sets into one CQR (vectorized-ish:
        accumulate per pixel, fm wins)."""
        acc: dict[int, np.ndarray | None] = {}  # None == full match
        for pixels, fm, items in rows:
            for k in range(len(pixels)):
                p = int(pixels[k])
                if p in acc and acc[p] is None:
                    continue  # already full
                if fm[k]:
                    acc[p] = None
                elif p in acc:
                    acc[p] = np.union1d(acc[p], items[k])
                else:
                    acc[p] = items[k]
        pix = sorted(acc)
        fm_arr = [acc[p] is None for p in pix]
        item_arr = [acc[p] for p in pix]
        return self._cqr_from_rows(pix, fm_arr, item_arr)

    def _term_cqr(self, leaf: TermLeaf) -> CQR:
        if leaf.flavor == "region":
            return self._region_cqr_by_match(leaf.value, leaf.qt)
        names = self._matching_terms(leaf.value, leaf.qt)
        if not names:
            return self._empty()
        rows = [self._terms[t] for t in names]
        return self._union_pixel_rows(rows)

    # -- region / cell leaves -------------------------------------------
    def _cell_cqr(self, cell_id: int) -> CQR:
        entries = self._cells.get(int(cell_id), [])
        pix, fm, items = [], [], []
        for p, docs in entries:
            total = self._post(p)
            full = len(docs) == len(total)
            pix.append(p); fm.append(full); items.append(None if full else docs)
        return self._cqr_from_rows(pix, fm, items)

    def _region_cqr(self, name: str) -> CQR:
        out = self._empty()
        for cid in self._region_cells.get(name, []):
            out = out.union(self._cell_cqr(cid))
        return out

    def _region_cqr_by_match(self, value: str, qt: str) -> CQR:
        out = self._empty()
        for name in self._region_cells:
            ok = (
                name == value if qt == "exact"
                else name.startswith(value) if qt == "prefix"
                else name.endswith(value) if qt == "suffix"
                else value in name
            )
            if ok:
                out = out.union(self._region_cqr(name))
        return out

    # -- geometry leaves (engine extensions; reference throws,
    #    static-htm-index.h:233-244) ------------------------------------
    def _cqr_from_point_mask(self, mask: np.ndarray) -> CQR:
        docs = self._pt_doc[mask]
        pixs = self._pt_pix[mask]
        if not len(docs):
            return self._empty()
        order = np.lexsort((docs, pixs))
        pixs, docs = pixs[order], docs[order]
        starts = np.nonzero(np.r_[True, pixs[1:] != pixs[:-1]])[0]
        pix, fm, items = [], [], []
        for s, e in zip(starts, np.r_[starts[1:], len(pixs)]):
            p = int(pixs[s])
            d = np.unique(docs[s:e])
            full = len(d) == len(self._post(p))
            pix.append(p); fm.append(full); items.append(None if full else d)
        return self._cqr_from_rows(pix, fm, items)

    def _rect_cqr(self, r: RectLeaf) -> CQR:
        la0, la1 = sorted((r.lat0, r.lat1))
        lo0, lo1 = sorted((r.lon0, r.lon1))
        mask = (
            (self._pt_lat >= la0) & (self._pt_lat <= la1)
            & (self._pt_lon >= lo0) & (self._pt_lon <= lo1)
        )
        return self._cqr_from_point_mask(mask)

    def _poly_cqr(self, p: PolyLeaf) -> CQR:
        idx = PolygonIndex(np.array([1]), [np.asarray(p.ring, dtype=np.float64)])
        inside = idx.assign_first(self._pt_lat, self._pt_lon) == 1
        return self._cqr_from_point_mask(inside)

    def _point_cqr(self, p: PointLeaf) -> CQR:
        pid = self.grid.encode(np.array([p.lat]), np.array([p.lon]), self.level)
        pix = int(pid.view(np.int64)[0])
        docs = self._post(pix)
        if not len(docs):
            return self._empty()
        return self._cqr_from_rows([pix], [True], [None])

    def _near_cqr(self, n: NearLeaf) -> CQR:
        d = _haversine_km(n.lat, n.lon, self._pt_lat, self._pt_lon)
        if n.k >= len(d):
            mask = np.ones(len(d), bool)
        else:
            # k nearest POINTS (deterministic tie-break by doc, point order)
            order = np.lexsort((np.arange(len(d)), self._pt_doc, d))[: n.k]
            mask = np.zeros(len(d), bool)
            mask[order] = True
        return self._cqr_from_point_mask(mask)

    def _dilate_cqr(self, cqr: CQR, km: float) -> CQR:
        """CELL_DILATION (engine extension): add, as full-match, every
        POPULATED pixel whose bbox intersects the km-grown bbox of any
        matched pixel.  The reference parses this op but throws
        (static-htm-index.h:253-267); semantics are pixel-granular, like
        allToFull."""
        if not len(cqr.pixels) or km <= 0:
            return cqr
        la0, la1, lo0, lo1 = self.grid.bbox(cqr.pixels.view(np.uint64))
        dlat = km / 111.195
        mid = np.clip(np.abs((la0 + la1) / 2.0), 0.0, 89.0)
        dlon = dlat / np.cos(np.radians(mid))
        la0, la1, lo0, lo1 = la0 - dlat, la1 + dlat, lo0 - dlon, lo1 + dlon
        # test every populated pixel against the grown boxes (vectorized
        # per populated pixel; grown-box count = |query pixels|, small)
        pop = np.array(sorted(self._postings), dtype=np.int64)
        pl0, pl1, po0, po1 = self.grid.bbox(pop.view(np.uint64))
        hit = np.zeros(len(pop), dtype=bool)
        for k in range(len(la0)):
            hit |= (pl1 >= la0[k]) & (pl0 <= la1[k]) & (po1 >= lo0[k]) & (po0 <= lo1[k])
        extra = pop[hit]
        dil = self._cqr_from_rows(extra, [True] * len(extra), [None] * len(extra))
        return cqr.union(dil)

    # -- evaluation ------------------------------------------------------
    def evaluate(self, node: Node) -> CQR:
        if isinstance(node, TermLeaf):
            return self._term_cqr(node)
        if isinstance(node, RegionLeaf):
            return self._region_cqr(node.name)
        if isinstance(node, CellLeaf):
            return self._cell_cqr(node.cell_id)
        if isinstance(node, RectLeaf):
            return self._rect_cqr(node)
        if isinstance(node, PolyLeaf):
            return self._poly_cqr(node)
        if isinstance(node, PointLeaf):
            return self._point_cqr(node)
        if isinstance(node, NearLeaf):
            return self._near_cqr(node)
        if isinstance(node, AllToFull):
            return self.evaluate(node.child).all_to_full()
        if isinstance(node, Dilate):
            return self._dilate_cqr(self.evaluate(node.child), node.km)
        if isinstance(node, SetOp):
            return self.evaluate(node.left).apply(node.op, self.evaluate(node.right))
        raise ParseError(f"unsupported node {node!r}")

    def complete(self, query: str) -> CQR:
        """Parse + evaluate (OscarSearchWithSg::complete analogue,
        apps/main.cpp:184)."""
        return self.evaluate(parse(query))

    def complete_treed(self, query: str):
        """Lazy evaluation: leaves eager, set ops deferred — the TreedCQR
        path (CQR-type template param analogue,
        include/hic/static-htm-index.h:60-70; materialize with .to_cqr())."""
        from .cqr import TreedCQR

        def go(node: Node):
            if isinstance(node, SetOp):
                return go(node.left).apply(node.op, go(node.right))
            if isinstance(node, AllToFull):
                return go(node.child).all_to_full()
            return TreedCQR.from_cqr(self.evaluate(node))

        return go(parse(query))

    @lru_cache(maxsize=256)
    def flatten_query(self, query: str) -> tuple:
        """Cached query → sorted doc-id tuple (HCQRIndexWithCache
        analogue, apps/mainq.cpp:495-497)."""
        return tuple(self.complete(query).flaten().tolist())


def _haversine_km(qlat, qlon, lat, lon):
    R = 6371.0
    p1, p2 = np.radians(qlat), np.radians(lat)
    dp = np.radians(lat - qlat)
    dl = np.radians(lon - qlon)
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * R * np.arcsin(np.sqrt(a))
