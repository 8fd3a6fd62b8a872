"""HTM — Hierarchical Triangular Mesh, from scratch in vectorized NumPy.

Re-creation of the reference's ``HtmSpatialGrid`` (src/HtmSpatialGrid.cpp,
167 LoC over lsst::sphgeom::HtmPixelization): 8 root spherical triangles
(4 north, 4 south), each recursively split into 4 by edge midpoints.

Id scheme (standard HTM): roots are ``0b1000 | k`` (8..15); each level
appends 2 bits of child index, so ``parent = id >> 2``
(src/HtmSpatialGrid.cpp:100-112) and ``is_ancestor`` is a bit-shift
compare (src/HtmSpatialGrid.cpp:55-63).  Level of id = (bit_length-4)/2.

The subdivision math follows the published HTM paper (Szalay et al.,
"Indexing the Sphere with the Hierarchical Triangular Mesh"): child
k<3 keeps vertex k and takes the two adjacent edge midpoints; child 3
is the central midpoint triangle.
"""

from __future__ import annotations

import numpy as np

from .base import Grid, register_grid

_V = np.array(
    [
        [0.0, 0.0, 1.0],   # v0 north pole
        [1.0, 0.0, 0.0],   # v1
        [0.0, 1.0, 0.0],   # v2
        [-1.0, 0.0, 0.0],  # v3
        [0.0, -1.0, 0.0],  # v4
        [0.0, 0.0, -1.0],  # v5 south pole
    ]
)
# root triangles S0..S3 (ids 8..11), N0..N3 (ids 12..15), standard HTM layout
_ROOT_TRIS = np.array(
    [
        [1, 5, 2],  # S0
        [2, 5, 3],  # S1
        [3, 5, 4],  # S2
        [4, 5, 1],  # S3
        [1, 0, 4],  # N0
        [4, 0, 3],  # N1
        [3, 0, 2],  # N2
        [2, 0, 1],  # N3
    ]
)

_EPS = -1e-12  # boundary tolerance: points on an edge go to the first matching child


def _unit_vec(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    la, lo = np.radians(lat), np.radians(lon)
    cl = np.cos(la)
    return np.stack([cl * np.cos(lo), cl * np.sin(lo), np.sin(la)], axis=-1)


def _contains(a, b, c, p):
    """p inside spherical triangle (a,b,c)? All cross(x,y)·p >= eps, vectorized."""
    return (
        (np.einsum("ij,ij->i", np.cross(a, b), p) >= _EPS)
        & (np.einsum("ij,ij->i", np.cross(b, c), p) >= _EPS)
        & (np.einsum("ij,ij->i", np.cross(c, a), p) >= _EPS)
    )


def _mid(a, b):
    m = a + b
    return m / np.linalg.norm(m, axis=-1, keepdims=True)


class HTMGrid(Grid):
    name = "htm"
    max_level = 20

    def __init__(self, default_level: int = 8):
        self.default_level = default_level

    # -- encode ----------------------------------------------------------
    def encode(self, lat, lon, level: int | None = None):
        if level is None:
            level = self.default_level
        p = _unit_vec(np.asarray(lat, np.float64), np.asarray(lon, np.float64))
        n = len(p)
        ids = np.full(n, 8, dtype=np.uint64)
        tri = np.empty((n, 3, 3))
        assigned = np.zeros(n, dtype=bool)
        for k in range(8):
            a, b, c = (_V[i] for i in _ROOT_TRIS[k])
            hit = ~assigned & _contains(
                np.broadcast_to(a, p.shape), np.broadcast_to(b, p.shape),
                np.broadcast_to(c, p.shape), p
            )
            ids[hit] = np.uint64(8 + k)
            tri[hit] = np.array([a, b, c])
            assigned |= hit
        # numerical stragglers (exactly-on-boundary after rounding): nearest root center
        if not assigned.all():
            left = ~assigned
            centers = _V[_ROOT_TRIS].mean(axis=1)
            centers /= np.linalg.norm(centers, axis=1, keepdims=True)
            k = np.argmax(p[left] @ centers.T, axis=1)
            ids[left] = (8 + k).astype(np.uint64)
            tri[left] = _V[_ROOT_TRIS[k]]
            assigned[:] = True

        for _ in range(level):
            a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
            w0, w1, w2 = _mid(b, c), _mid(a, c), _mid(a, b)
            in0 = _contains(a, w2, w1, p)
            in1 = ~in0 & _contains(b, w0, w2, p)
            in2 = ~in0 & ~in1 & _contains(c, w1, w0, p)
            child = np.where(in0, 0, np.where(in1, 1, np.where(in2, 2, 3))).astype(np.uint64)
            ids = (ids << np.uint64(2)) | child
            new_tri = np.empty_like(tri)
            new_tri[in0] = np.stack([a[in0], w2[in0], w1[in0]], axis=1)
            new_tri[in1] = np.stack([b[in1], w0[in1], w2[in1]], axis=1)
            new_tri[in2] = np.stack([c[in2], w1[in2], w0[in2]], axis=1)
            rest = ~(in0 | in1 | in2)
            new_tri[rest] = np.stack([w0[rest], w1[rest], w2[rest]], axis=1)
            tri = new_tri
        return ids

    # -- hierarchy (pure bit math, src/HtmSpatialGrid.cpp:55-63,100-112) --
    def level(self, pid):
        pid = np.asarray(pid, dtype=np.uint64)
        # level = (bit_length - 4) / 2
        bl = np.zeros(pid.shape, dtype=np.int64)
        x = pid.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            hi = x >> np.uint64(shift)
            has = hi > 0
            bl[has] += shift
            x = np.where(has, hi, x)
        bl += 1
        return ((bl - 4) // 2).astype(np.uint8)

    def parent(self, pid, steps: int = 1):
        pid = np.asarray(pid, dtype=np.uint64)
        lvl = self.level(pid).astype(np.int64)
        s = np.minimum(steps, lvl).astype(np.uint64)
        return pid >> (np.uint64(2) * s)

    def is_ancestor(self, anc, desc):
        anc = np.asarray(anc, dtype=np.uint64)
        desc = np.asarray(desc, dtype=np.uint64)
        la = self.level(anc).astype(np.int64)
        ld = self.level(desc).astype(np.int64)
        shift = np.maximum(ld - la, 0).astype(np.uint64) * np.uint64(2)
        return (ld >= la) & ((desc >> shift) == anc)

    def children(self, pid: int):
        pid = np.uint64(int(pid) & 0xFFFFFFFFFFFFFFFF)
        if int(self.level(np.array([pid]))[0]) >= self.max_level:
            return np.empty(0, dtype=np.uint64)
        return (pid << np.uint64(2)) | np.arange(4, dtype=np.uint64)

    def root_ids(self):
        return np.arange(8, 16, dtype=np.uint64)

    # -- geometry --------------------------------------------------------
    def triangle(self, pid: int) -> np.ndarray:
        """Vertices (3,3 unit vectors) of one pixel — walk the bit path."""
        pid = int(pid)
        lvl = int(self.level(np.array([pid], dtype=np.uint64))[0])
        path = [(pid >> (2 * i)) & 3 for i in range(lvl)][::-1]
        root = (pid >> (2 * lvl)) - 8
        a, b, c = (_V[i] for i in _ROOT_TRIS[root])
        for ch in path:
            w0 = (b + c) / np.linalg.norm(b + c)
            w1 = (a + c) / np.linalg.norm(a + c)
            w2 = (a + b) / np.linalg.norm(a + b)
            if ch == 0:
                a, b, c = a, w2, w1
            elif ch == 1:
                a, b, c = b, w0, w2
            elif ch == 2:
                a, b, c = c, w1, w0
            else:
                a, b, c = w0, w1, w2
        return np.stack([a, b, c])

    def bbox(self, pid):
        pid = np.atleast_1d(np.asarray(pid, dtype=np.uint64))
        la0 = np.empty(len(pid)); la1 = np.empty(len(pid))
        lo0 = np.empty(len(pid)); lo1 = np.empty(len(pid))
        for i, p in enumerate(pid):
            t = self.triangle(int(p))
            # include edge midpoints: great-circle edges bulge past the
            # chord bbox at coarse levels
            mids = _mid(t, np.roll(t, 1, axis=0))
            t = np.concatenate([t, mids])
            lats = np.degrees(np.arcsin(np.clip(t[:, 2], -1, 1)))
            lons = np.degrees(np.arctan2(t[:, 1], t[:, 0]))
            la0[i], la1[i] = lats.min(), lats.max()
            # handle antimeridian-free case simply; wrap-around spans full range
            if lons.max() - lons.min() > 180.0:
                lo0[i], lo1[i] = -180.0, 180.0
            else:
                lo0[i], lo1[i] = lons.min(), lons.max()
            if np.abs(t[:, 2]).max() > 0.999999:  # touches a pole
                if t[:, 2].max() > 0.999999:
                    la1[i] = 90.0
                else:
                    la0[i] = -90.0
                lo0[i], lo1[i] = -180.0, 180.0
        return la0, la1, lo0, lo1


register_grid("htm", HTMGrid)
