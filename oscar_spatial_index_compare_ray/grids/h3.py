"""H3-style hexagonal grid, from scratch in vectorized NumPy.

Re-creation of the reference's ``H3SpatialGrid`` (src/H3SpatialGrid.cpp,
155 LoC over Uber's libh3: geoToH3 / h3ToParent / h3ToGeoBoundary).  The
sandbox has no h3 wheel and SURVEY.md §7 defines this grid by our own
spec: an *H3-approximating* hexagonal hierarchy —

  - pointy-top axial hex grid in equirectangular (lon, lat) degrees,
  - aperture-7 scaling: resolution r hexes have circumradius
    ``R0 / sqrt(7)^r`` with R0 = 10°, so res 8 hexes are ~0.004°
    (≈460 m), matching real H3 res-8 edge length closely,
  - parenting by *center containment* (the hex at res r-1 containing
    this hex's center) — approximate nesting exactly as in real H3,
    where children only mostly lie inside their parent,
  - ``is_ancestor`` by iterated parent, mirroring
    src/H3SpatialGrid.cpp:49-62,
  - a synthetic root pixel above res 0, mirroring
    ``RootPixelId = u64::max`` (include/hic/H3SpatialGrid.h:6,9).

Id layout: ``(1<<63) | res<<52 | (q + 2^25)<<26 | (r + 2^25)`` with
axial coords (q, r).
"""

from __future__ import annotations

import numpy as np

from .base import Grid, register_grid

_U64 = np.uint64
_FLAG = _U64(1) << _U64(63)
_RES_SHIFT = _U64(52)
_Q_SHIFT = _U64(26)
_COORD_OFF = 1 << 25
_COORD_MASK = _U64((1 << 26) - 1)
_R0 = 10.0  # res-0 circumradius in degrees
_SQRT7 = np.sqrt(7.0)
_SQRT3 = np.sqrt(3.0)

ROOT_PIXEL_ID = _U64(0xFFFFFFFFFFFFFFFF)  # synthetic root (H3SpatialGrid.h:6,9)


def _size(res: np.ndarray | int) -> np.ndarray:
    return _R0 / _SQRT7 ** np.asarray(res, dtype=np.float64)


def _axial_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cube-coordinate rounding (standard hex-grid algorithm)."""
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = np.round(xf), np.round(yf), np.round(zf)
    dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


class H3Grid(Grid):
    name = "h3"
    max_level = 14  # 26-bit axial coords bound the finest resolution

    def __init__(self, default_level: int = 8):
        self.default_level = default_level

    # -- encode (geoToH3 analogue, src/H3SpatialGrid.cpp:64-73) ----------
    def encode(self, lat, lon, level: int | None = None):
        if level is None:
            level = self.default_level
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        s = _size(level)
        qf = (_SQRT3 / 3.0 * lon - 1.0 / 3.0 * lat) / s
        rf = (2.0 / 3.0 * lat) / s
        q, r = _axial_round(qf, rf)
        return self._pack(np.full(len(lat), level), q, r)

    @staticmethod
    def _pack(res, q, r):
        res = np.asarray(res, dtype=np.uint64)
        qq = (np.asarray(q, dtype=np.int64) + _COORD_OFF).astype(np.uint64)
        rr = (np.asarray(r, dtype=np.int64) + _COORD_OFF).astype(np.uint64)
        return _FLAG | (res << _RES_SHIFT) | (qq << _Q_SHIFT) | rr

    @staticmethod
    def _unpack(pid):
        pid = np.asarray(pid, dtype=np.uint64)
        res = ((pid >> _RES_SHIFT) & _U64(0x7FF)).astype(np.int64)
        q = ((pid >> _Q_SHIFT) & _COORD_MASK).astype(np.int64) - _COORD_OFF
        r = (pid & _COORD_MASK).astype(np.int64) - _COORD_OFF
        return res, q, r

    def center(self, pid) -> tuple[np.ndarray, np.ndarray]:
        res, q, r = self._unpack(pid)
        s = _size(res)
        lat = 1.5 * s * r
        lon = _SQRT3 * s * (q + r / 2.0)
        return lat, lon

    def level(self, pid):
        pid = np.asarray(pid, dtype=np.uint64)
        res = ((pid >> _RES_SHIFT) & _U64(0x7FF)).astype(np.uint8)
        return np.where(pid == ROOT_PIXEL_ID, np.uint8(0), res)

    # -- parent by center containment (h3ToParent analogue, :94-106) -----
    def parent(self, pid, steps: int = 1):
        pid = np.asarray(pid, dtype=np.uint64).copy()
        for _ in range(steps):
            res = ((pid >> _RES_SHIFT) & _U64(0x7FF)).astype(np.int64)
            at_root = (res == 0) | (pid == ROOT_PIXEL_ID)
            lat, lon = self.center(pid)
            up = self._encode_levels(lat, lon, np.maximum(res - 1, 0))
            pid = np.where(at_root, ROOT_PIXEL_ID, up)
        return pid

    def _encode_levels(self, lat, lon, levels: np.ndarray):
        """encode with a per-element level array."""
        s = _size(levels)
        qf = (_SQRT3 / 3.0 * np.asarray(lon) - 1.0 / 3.0 * np.asarray(lat)) / s
        rf = (2.0 / 3.0 * np.asarray(lat)) / s
        q, r = _axial_round(qf, rf)
        return self._pack(levels, q, r)

    def children(self, pid: int):
        """Hexes at res+1 whose parent is ``pid`` (≈7, like
        maxH3ToChildrenSize, src/H3SpatialGrid.cpp:108-116).  Scans the
        k=2 ring of the center child."""
        pid = _U64(int(pid) & 0xFFFFFFFFFFFFFFFF)
        if pid == ROOT_PIXEL_ID:
            # res-0 cells covering the world are unbounded in a planar
            # axial scheme; return the res-0 hexes covering lat/lon space
            return self.cover_bbox(-90.0, 90.0, -180.0, 180.0, level=0)
        res, q, r = self._unpack(np.array([pid]))
        res, q, r = int(res[0]), int(q[0]), int(r[0])
        if res >= self.max_level:
            return np.empty(0, dtype=np.uint64)
        clat, clon = self.center(np.array([pid], dtype=np.uint64))
        ctr = self.encode(clat, clon, level=res + 1)
        cres, cq, cr = self._unpack(ctr)
        cand_q, cand_r = [], []
        for dq in range(-2, 3):
            for dr in range(-2, 3):
                if abs(dq + dr) <= 2:
                    cand_q.append(int(cq[0]) + dq)
                    cand_r.append(int(cr[0]) + dr)
        cand = self._pack(np.full(len(cand_q), res + 1), np.array(cand_q), np.array(cand_r))
        par = self.parent(cand)
        return np.sort(cand[par == pid])

    def root_ids(self):
        return np.array([ROOT_PIXEL_ID], dtype=np.uint64)

    def bbox(self, pid):
        pid = np.atleast_1d(np.asarray(pid, dtype=np.uint64))
        res, q, r = self._unpack(pid)
        s = _size(res)
        lat, lon = self.center(pid)
        is_root = pid == ROOT_PIXEL_ID
        la0 = np.where(is_root, -90.0, lat - s)
        la1 = np.where(is_root, 90.0, lat + s)
        w = _SQRT3 / 2.0 * s
        lo0 = np.where(is_root, -180.0, lon - w)
        lo1 = np.where(is_root, 180.0, lon + w)
        return la0, la1, lo0, lo1

    def area_km2(self, pid):
        res, _, _ = self._unpack(pid)
        s = _size(res)
        lat, _ = self.center(pid)
        km = 111.195
        return 1.5 * _SQRT3 * (s * km) * (s * km * np.cos(np.radians(np.clip(lat, -89.9, 89.9))))

    def cover_bbox(self, lat_min, lat_max, lon_min, lon_max, level=None, max_cells=None):
        """Direct axial-range cover (no tree walk needed for a flat hex grid)."""
        if level is None:
            level = self.default_level
        s = _size(level)
        if max_cells is not None:
            est = ((lat_max - lat_min) / (1.5 * s) + 3) * ((lon_max - lon_min) / (_SQRT3 * s) + 3)
            if est > max_cells:
                return None
        rs = np.arange(int(np.floor(lat_min / (1.5 * s))) - 1,
                       int(np.ceil(lat_max / (1.5 * s))) + 2)
        out_q, out_r = [], []
        for r in rs:
            lat = 1.5 * s * r
            q0 = int(np.floor((lon_min / (_SQRT3 * s)) - r / 2.0)) - 1
            q1 = int(np.ceil((lon_max / (_SQRT3 * s)) - r / 2.0)) + 1
            qs = np.arange(q0, q1 + 1)
            out_q.append(qs)
            out_r.append(np.full(len(qs), r))
        q = np.concatenate(out_q)
        r = np.concatenate(out_r)
        ids = self._pack(np.full(len(q), level), q, r)
        la0, la1, lo0, lo1 = self.bbox(ids)
        hit = (la1 >= lat_min) & (la0 <= lat_max) & (lo1 >= lon_min) & (lo0 <= lon_max)
        return np.unique(ids[hit])


register_grid("h3", H3Grid)
