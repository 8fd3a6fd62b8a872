"""S2-style cube-face Hilbert grid, from scratch in vectorized NumPy.

Re-creation of the reference's ``S2GeomSpatialGrid``
(src/S2GeomSpatialGrid.cpp, 148 LoC over the s2geometry library): point →
cube face → (u,v) → (s,t) → (i,j) → Hilbert curve position; cell id =
``face(3 bits) | hilbert_pos(2·30 bits) | sentinel 1`` with the standard
S2 lsb trick for parent/level (src/S2GeomSpatialGrid.cpp:79-101).

This is an *S2-style* grid, not bit-compatible with Google S2 (the
sandbox has no s2 wheel, and SURVEY.md §7 sets cross-grid agreement of
query results — not cell ids — as the correctness bar).  Differences:
the quadratic uv→st reprojection is kept, but the Hilbert orientation
seed per face is the plain curve (no face-parity swap).
"""

from __future__ import annotations

import numpy as np

from .base import Grid, register_grid

_MAX_LEVEL = 30
_U64 = np.uint64


def _unit_vec(lat, lon):
    la, lo = np.radians(lat), np.radians(lon)
    cl = np.cos(la)
    return np.stack([cl * np.cos(lo), cl * np.sin(lo), np.sin(la)], axis=-1)


def _face_uv(p: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """xyz → (face 0..5, u, v) with the standard S2 face layout."""
    ax = np.abs(p)
    face = np.where(
        ax[:, 0] >= np.maximum(ax[:, 1], ax[:, 2]),
        np.where(p[:, 0] >= 0, 0, 3),
        np.where(
            ax[:, 1] >= ax[:, 2],
            np.where(p[:, 1] >= 0, 1, 4),
            np.where(p[:, 2] >= 0, 2, 5),
        ),
    )
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    u = np.empty(len(p)); v = np.empty(len(p))
    for f, (ue, ve, de) in enumerate(
        [
            (lambda: y / x, lambda: z / x, None),      # face 0: +x
            (lambda: -x / y, lambda: z / y, None),     # face 1: +y
            (lambda: -x / z, lambda: -y / z, None),    # face 2: +z
            (lambda: z / x, lambda: y / x, None),      # face 3: -x
            (lambda: z / y, lambda: -x / y, None),     # face 4: -y
            (lambda: -y / z, lambda: -x / z, None),    # face 5: -z
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face.astype(np.uint64), u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection (area-equalizing)."""
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1 + 3 * u), 1 - 0.5 * np.sqrt(np.maximum(1 - 3 * u, 0.0)))


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(s >= 0.5, (1.0 / 3.0) * (4 * s * s - 1), (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s)))


def _hilbert_xy2d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized Hilbert (i,j) → curve position, ``order`` bits per axis."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros(len(x), dtype=np.uint64)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += _U64(s) * _U64(s) * ((3 * rx) ^ ry).astype(np.uint64)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d


def _hilbert_d2xy(order: int, d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    d = d.astype(np.uint64).copy()
    x = np.zeros(len(d), dtype=np.int64)
    y = np.zeros(len(d), dtype=np.int64)
    s = np.int64(1)
    t = d.copy()
    while s < (np.int64(1) << order):
        rx = (np.uint64(1) & (t // np.uint64(2))).astype(np.int64)
        ry = (np.uint64(1) & (t ^ rx.astype(np.uint64))).astype(np.int64)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        x = x + s * rx
        y = y + s * ry
        t //= np.uint64(4)
        s <<= 1
    return x, y


class S2Grid(Grid):
    name = "s2"
    max_level = _MAX_LEVEL

    def __init__(self, default_level: int = 8):
        self.default_level = default_level

    def encode(self, lat, lon, level: int | None = None):
        if level is None:
            level = self.default_level
        p = _unit_vec(np.asarray(lat, np.float64), np.asarray(lon, np.float64))
        face, u, v = _face_uv(p)
        n = np.int64(1) << _MAX_LEVEL
        i = np.clip((_uv_to_st(u) * n).astype(np.int64), 0, n - 1)
        j = np.clip((_uv_to_st(v) * n).astype(np.int64), 0, n - 1)
        pos = _hilbert_xy2d(_MAX_LEVEL, i, j)
        leaf = (face << _U64(2 * _MAX_LEVEL + 1)) | (pos << _U64(1)) | _U64(1)
        # snap to level: clear low bits, set the level's sentinel lsb
        # (the standard S2 lsb trick, src/S2GeomSpatialGrid.cpp:79-101)
        lsb = _U64(1) << _U64(2 * (_MAX_LEVEL - level))
        return (leaf & ~(lsb - _U64(1))) | lsb

    def level(self, pid):
        pid = np.asarray(pid, dtype=np.uint64)
        # lsb position → level (trailing zeros / 2)
        tz = np.zeros(pid.shape, dtype=np.int64)
        x = pid.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = (x & ((_U64(1) << _U64(shift)) - _U64(1))) == 0
            tz[mask] += shift
            x = np.where(mask, x >> _U64(shift), x)
        return (_MAX_LEVEL - tz // 2).astype(np.uint8)

    def lsb(self, pid):
        pid = np.asarray(pid, dtype=np.uint64)
        return pid & (~pid + _U64(1))

    def parent(self, pid, steps: int = 1):
        pid = np.asarray(pid, dtype=np.uint64)
        lvl = self.level(pid).astype(np.int64)
        s = np.minimum(steps, lvl)
        new_lsb = self.lsb(pid) << (_U64(2) * s.astype(np.uint64))
        return (pid & ~(new_lsb - _U64(1))) | new_lsb

    def is_ancestor(self, anc, desc):
        anc = np.asarray(anc, dtype=np.uint64)
        desc = np.asarray(desc, dtype=np.uint64)
        l = self.lsb(anc)
        return ((anc - (l - _U64(1))) <= desc) & (desc <= (anc + (l - _U64(1))))

    def children(self, pid: int):
        pid = np.uint64(int(pid) & 0xFFFFFFFFFFFFFFFF)
        lvl = int(self.level(np.array([pid]))[0])
        if lvl >= self.max_level:
            return np.empty(0, dtype=np.uint64)
        old_lsb = np.uint64(pid) & (~np.uint64(pid) + _U64(1))
        new_lsb = old_lsb >> _U64(2)
        base = pid - old_lsb
        return np.array(
            [base + new_lsb + _U64(2) * new_lsb * _U64(k) for k in range(4)], dtype=np.uint64
        )

    def root_ids(self):
        lsb = _U64(1) << _U64(2 * _MAX_LEVEL)
        return (np.arange(6, dtype=np.uint64) << _U64(2 * _MAX_LEVEL + 1)) | lsb

    def bbox(self, pid):
        pid = np.atleast_1d(np.asarray(pid, dtype=np.uint64))
        lvl = self.level(pid).astype(np.int64)
        face = pid >> _U64(2 * _MAX_LEVEL + 1)
        lsb = self.lsb(pid)
        pos = (pid & ((_U64(1) << _U64(2 * _MAX_LEVEL + 1)) - _U64(1))) >> _U64(1)
        la0 = np.empty(len(pid)); la1 = np.empty(len(pid))
        lo0 = np.empty(len(pid)); lo1 = np.empty(len(pid))
        # corners of the cell in (i, j) leaf space
        size = lsb  # lsb == 2^(2*(30-level)); side in leaf units = 2^(30-level)
        side = np.sqrt(size.astype(np.float64)).astype(np.int64)
        i0, j0 = _hilbert_d2xy(_MAX_LEVEL, pos & ~(size - _U64(1)))
        # cell-aligned: mask i,j to the cell grid
        i0 = i0 & ~(side - 1)
        j0 = j0 & ~(side - 1)
        n = float(np.int64(1) << _MAX_LEVEL)
        frac = np.linspace(0.0, 1.0, 5)
        for k in range(len(pid)):
            f = int(face[k])
            corners = []
            # sample the cell boundary, not just corners: straight uv-space
            # edges curve in lat/lon, so extremes can sit mid-edge
            w = float(side[k])
            boundary = (
                [(t * w, 0.0) for t in frac]
                + [(t * w, w) for t in frac]
                + [(0.0, t * w) for t in frac]
                + [(w, t * w) for t in frac]
            )
            for di, dj in boundary:
                s = (i0[k] + di) / n
                t = (j0[k] + dj) / n
                u = _st_to_uv(np.array([s]))[0]
                v = _st_to_uv(np.array([t]))[0]
                corners.append(_face_uv_inverse(f, u, v))
            c = np.array(corners)
            lats = np.degrees(np.arcsin(np.clip(c[:, 2] / np.linalg.norm(c, axis=1), -1, 1)))
            lons = np.degrees(np.arctan2(c[:, 1], c[:, 0]))
            la0[k], la1[k] = lats.min(), lats.max()
            if lons.max() - lons.min() > 180.0:
                lo0[k], lo1[k] = -180.0, 180.0
            else:
                lo0[k], lo1[k] = lons.min(), lons.max()
            if f == 2:
                la1[k] = 90.0 if lvl[k] == 0 else la1[k]
            if f == 5:
                la0[k] = -90.0 if lvl[k] == 0 else la0[k]
        return la0, la1, lo0, lo1


def _face_uv_inverse(face: int, u: float, v: float) -> np.ndarray:
    if face == 0:
        return np.array([1.0, u, v])
    if face == 1:
        return np.array([-u, 1.0, v])
    if face == 2:
        return np.array([-u, -v, 1.0])
    if face == 3:
        return np.array([-1.0, -v, -u])  # inverse of (z/x, y/x) with x<0
    if face == 4:
        return np.array([v, -1.0, -u])   # inverse of (z/y, -x/y) with y<0
    return np.array([v, u, -1.0])        # inverse of (-y/z, -x/z) with z<0


register_grid("s2", S2Grid)
