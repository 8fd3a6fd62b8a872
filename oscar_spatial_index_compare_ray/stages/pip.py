"""Point-in-polygon spatial join: the core stateful stage of the graft.

Engine analogue of the reference's triangulation-arrangement lookup
``state->tr.cellIds(p)`` (src/OscarSgIndex.cpp:106-112): assign every
point the polygon cell containing it, sentinel cell 0 when none does
(src/OscarSgIndex.cpp:107-109).

Architecture (SURVEY.md §2.5 "PIP lookup (spatial join)"):
  - The polygon side is SMALL (a region/cell partition) → broadcast it
    once with ``ray.put`` and build a ``PolygonIndex`` in each actor's
    ``__init__`` — never re-shipped per batch, no shuffle join.
  - ``PolygonIndex`` is a pure-NumPy STRtree stand-in: a uniform bin
    grid over the polygon set's bbox; each bin holds candidate polygon
    ids; a query gathers each point's bin candidates and ray-casts
    vectorized (points × candidate edges).
  - Ray-cast parity uses EXACTLY the arithmetic the DuckDB oracle SQL
    uses (``((y1>lat) != (y2>lat)) AND lon < (x2-x1)*(lat-y1)/(y2-y1)+x1``)
    so engine and oracle agree bit-for-bit on double inputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SENTINEL_CELL = 0

_BINS = 64


class PolygonIndex:
    """Bin-grid index over a set of (id, ring) polygons; vectorized PIP."""

    def __init__(self, ids: np.ndarray, rings: list[np.ndarray]):
        """ids: int array; rings: list of (k, 2) arrays of (lat, lon)."""
        self.ids = np.asarray(ids)
        x1s, y1s, x2s, y2s, poly_of_edge = [], [], [], [], []
        self.bbox = np.empty((len(rings), 4))  # lat0, lat1, lon0, lon1
        for i, ring in enumerate(rings):
            ring = np.asarray(ring, dtype=np.float64)
            lat, lon = ring[:, 0], ring[:, 1]
            nlat, nlon = np.roll(lat, -1), np.roll(lon, -1)
            y1s.append(lat); x1s.append(lon); y2s.append(nlat); x2s.append(nlon)
            poly_of_edge.append(np.full(len(ring), i, dtype=np.int64))
            self.bbox[i] = (lat.min(), lat.max(), lon.min(), lon.max())
        self.x1 = np.concatenate(x1s); self.y1 = np.concatenate(y1s)
        self.x2 = np.concatenate(x2s); self.y2 = np.concatenate(y2s)
        self.poly_of_edge = np.concatenate(poly_of_edge)
        self.n_polys = len(rings)

        self.glat0, self.glat1 = self.bbox[:, 0].min(), self.bbox[:, 1].max()
        self.glon0, self.glon1 = self.bbox[:, 2].min(), self.bbox[:, 3].max()
        self.dlat = max((self.glat1 - self.glat0) / _BINS, 1e-9)
        self.dlon = max((self.glon1 - self.glon0) / _BINS, 1e-9)
        # bin → candidate polygon ids (list of arrays)
        self.bin_cands: list[np.ndarray] = [np.empty(0, np.int64)] * (_BINS * _BINS)
        tmp: dict[int, list[int]] = {}
        for i in range(self.n_polys):
            r0 = int((self.bbox[i, 0] - self.glat0) / self.dlat)
            r1 = int((self.bbox[i, 1] - self.glat0) / self.dlat)
            c0 = int((self.bbox[i, 2] - self.glon0) / self.dlon)
            c1 = int((self.bbox[i, 3] - self.glon0) / self.dlon)
            for r in range(max(r0, 0), min(r1, _BINS - 1) + 1):
                for c in range(max(c0, 0), min(c1, _BINS - 1) + 1):
                    tmp.setdefault(r * _BINS + c, []).append(i)
        for k, v in tmp.items():
            self.bin_cands[k] = np.asarray(v, dtype=np.int64)
        # per-polygon edge slices (edges are concatenated ring-by-ring)
        counts = np.bincount(self.poly_of_edge, minlength=self.n_polys)
        self.edge_start = np.zeros(self.n_polys + 1, dtype=np.int64)
        np.cumsum(counts, out=self.edge_start[1:])

    @classmethod
    def from_arrow(cls, table: pa.Table, id_col: str, poly_col: str = "polygon") -> "PolygonIndex":
        ids = table.column(id_col).to_numpy(zero_copy_only=False)
        rings = [
            np.array([(p["lat"], p["lon"]) for p in ring], dtype=np.float64)
            for ring in table.column(poly_col).to_pylist()
        ]
        return cls(ids, rings)

    def _contains(self, poly: int, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        """Vectorized ray cast of points against ONE polygon."""
        s, e = self.edge_start[poly], self.edge_start[poly + 1]
        x1, y1 = self.x1[s:e][None, :], self.y1[s:e][None, :]
        x2, y2 = self.x2[s:e][None, :], self.y2[s:e][None, :]
        la, lo = lat[:, None], lon[:, None]
        cond = (y1 > la) != (y2 > la)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (la - y1) / (y2 - y1) + x1
        cross = cond & (lo < xint)
        return (cross.sum(axis=1) % 2).astype(bool)

    def assign_first(self, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        """One id per point: the smallest matching polygon id, else
        SENTINEL_CELL.  For a disjoint partition (cells) 'smallest' is
        just 'the' id; the tie-rule makes overlapping inputs
        deterministic too.

        Fast-path note (reference parity): the reference skips the
        arrangement lookup when an item's payload claims exactly one
        cell (src/OscarSgIndex.cpp:120-129).  Web pages carry no
        pre-claimed cells, so the engine's equivalent saving is the
        two-stage candidate prune below — bin-grid candidate gathering
        plus a per-candidate bbox containment test — which skips the
        ray cast for every (point, polygon) pair that is trivially
        outside; only bbox-surviving pairs pay edge arithmetic."""
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        out = np.full(len(lat), SENTINEL_CELL, dtype=np.int64)
        if len(lat) == 0 or self.n_polys == 0:
            return out
        rr = np.floor((lat - self.glat0) / self.dlat).astype(np.int64)
        cc = np.floor((lon - self.glon0) / self.dlon).astype(np.int64)
        inb = (rr >= 0) & (rr < _BINS) & (cc >= 0) & (cc < _BINS)
        binno = np.where(inb, rr * _BINS + cc, -1)
        order = np.argsort(binno, kind="stable")
        sorted_bins = binno[order]
        # group points by bin, test each bin's candidates vectorized
        starts = np.nonzero(np.diff(sorted_bins, prepend=-2))[0]
        bounds = np.append(starts, len(sorted_bins))
        ids_sorted = np.iinfo(np.int64).max * np.ones(len(lat), dtype=np.int64)
        for gi in range(len(starts)):
            b = sorted_bins[starts[gi]]
            if b < 0:
                continue
            idx = order[bounds[gi]: bounds[gi + 1]]
            cands = self.bin_cands[b]
            if len(cands) == 0:
                continue
            best = np.iinfo(np.int64).max * np.ones(len(idx), dtype=np.int64)
            pla, plo = lat[idx], lon[idx]
            for poly in cands:
                bb = self.bbox[poly]
                pre = (pla >= bb[0]) & (pla <= bb[1]) & (plo >= bb[2]) & (plo <= bb[3])
                if not pre.any():
                    continue
                hit = np.zeros(len(idx), dtype=bool)
                hit[pre] = self._contains(poly, pla[pre], plo[pre])
                pid = self.ids[poly]
                best = np.where(hit & (pid < best), pid, best)
            ids_sorted[idx] = best
        got = ids_sorted != np.iinfo(np.int64).max
        out[got] = ids_sorted[got]
        return out

    def assign_all(self, lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(point_idx, polygon_id) pairs for EVERY containing polygon —
        the overlapping-regions path (multi-cell item,
        src/OscarSgIndex.cpp:104-119)."""
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        pts, ids = [], []
        for poly in range(self.n_polys):
            bb = self.bbox[poly]
            pre = (lat >= bb[0]) & (lat <= bb[1]) & (lon >= bb[2]) & (lon <= bb[3])
            if not pre.any():
                continue
            sel = np.nonzero(pre)[0]
            hit = self._contains(poly, lat[sel], lon[sel])
            pts.append(sel[hit])
            ids.append(np.full(hit.sum(), self.ids[poly], dtype=np.int64))
        if not pts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        p = np.concatenate(pts)
        i = np.concatenate(ids)
        o = np.lexsort((i, p))
        return p[o], i[o]


_PROCESS_INDEX_CACHE: dict[str, "PolygonIndex"] = {}


def make_pip_task(cells_ref, out_col: str = "cell_id"):
    """Task-based PIP stage with a per-worker-process index cache.

    The polygon index here is SMALL and cheap to build (tens of ms), so
    plain tasks + a process-global cache beat an actor pool: tasks are
    fully elastic (use every CPU at any cluster size, no pool ramp-up),
    and each worker process still builds the index exactly once from
    the broadcast ``ray.put`` ref.  Use the ``PipAssign`` actor pool
    instead when the state is heavy (big polygon sets, models, GPUs) —
    same semantics, explicit pool sizing."""
    import pyarrow as _pa

    key = cells_ref.hex() if hasattr(cells_ref, "hex") else str(id(cells_ref))

    def pip(batch: _pa.Table) -> _pa.Table:
        import ray as _ray

        idx = _PROCESS_INDEX_CACHE.get(key)
        if idx is None:
            table = _ray.get(cells_ref) if not isinstance(cells_ref, pa.Table) else cells_ref
            idx = PolygonIndex.from_arrow(table, "cell_id")
            _PROCESS_INDEX_CACHE[key] = idx
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        cid = idx.assign_first(lat, lon)
        return batch.append_column(out_col, pa.array(cid.astype(np.uint32), pa.uint32()))

    return pip


class PipAssign:
    """Actor-pool stage: add ``cell_id`` to a points batch.

    ``__init__`` receives a ``ray.put`` ObjectRef of the cells Arrow
    table — fetched and indexed ONCE per actor (the reference's
    mmap'd-arrangement-shared-by-workers pattern,
    src/OscarSgIndex.cpp:58-68,165-181)."""

    def __init__(self, cells_ref, id_col: str = "cell_id", out_col: str = "cell_id"):
        import ray

        table = ray.get(cells_ref) if not isinstance(cells_ref, pa.Table) else cells_ref
        self.index = PolygonIndex.from_arrow(table, id_col)
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        cid = self.index.assign_first(lat, lon)
        return batch.append_column(self.out_col, pa.array(cid.astype(np.uint32), pa.uint32()))
