"""SimpleGrid — uniform lat/lon grid with power-of-two refinement.

Engine analogue of the vendored ``sserialize::...::SimpleGridSpatialGrid``
(registered src/SpatialGridInitializer.cpp:13, selected
apps/main.cpp:131-133).  At level L the world splits into 2^L latitude
rows × 2^(L+1) longitude columns (square-ish cells); parent halves both.

Pixel id layout (SQL-mirrorable arithmetic — this grid doubles as the
DuckDB-oracle grid):  ``id = (level << 56) | (row << 28) | col``.
"""

from __future__ import annotations

import numpy as np

from .base import Grid, register_grid

_L_SHIFT = np.uint64(56)
_R_SHIFT = np.uint64(28)
_MASK28 = np.uint64((1 << 28) - 1)


class SimpleGrid(Grid):
    name = "simple"
    max_level = 24

    def __init__(self, default_level: int = 8):
        self.default_level = default_level

    @staticmethod
    def _dims(level: int) -> tuple[int, int]:
        return 1 << level, 2 << level  # rows, cols

    def encode(self, lat, lon, level: int | None = None):
        if level is None:
            level = self.default_level
        rows, cols = self._dims(level)
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        r = np.clip(np.floor((lat + 90.0) / (180.0 / rows)), 0, rows - 1).astype(np.uint64)
        c = np.clip(np.floor((lon + 180.0) / (360.0 / cols)), 0, cols - 1).astype(np.uint64)
        return (np.uint64(level) << _L_SHIFT) | (r << _R_SHIFT) | c

    @staticmethod
    def sql_expr(lat_col: str, lon_col: str, level: int) -> str:
        """DuckDB expression computing the identical pixel id (as BIGINT)."""
        rows, cols = 1 << level, 2 << level
        return (
            f"({level} * 72057594037927936 "
            f"+ CAST(least(greatest(floor(({lat_col} + 90.0) / {180.0 / rows!r}), 0), {rows - 1}) AS BIGINT) * 268435456 "
            f"+ CAST(least(greatest(floor(({lon_col} + 180.0) / {360.0 / cols!r}), 0), {cols - 1}) AS BIGINT))"
        )

    def level(self, pid):
        return (np.asarray(pid, dtype=np.uint64) >> _L_SHIFT).astype(np.uint8)

    def parent(self, pid, steps: int = 1):
        pid = np.asarray(pid, dtype=np.uint64)
        lvl = (pid >> _L_SHIFT).astype(np.int64)
        s = np.minimum(steps, lvl).astype(np.uint64)
        r = ((pid >> _R_SHIFT) & _MASK28) >> s
        c = (pid & _MASK28) >> s
        nl = (lvl - s.astype(np.int64)).astype(np.uint64)
        return (nl << _L_SHIFT) | (r << _R_SHIFT) | c

    def children(self, pid: int):
        pid = np.uint64(pid)
        lvl = int(pid >> _L_SHIFT)
        if lvl >= self.max_level:
            return np.empty(0, dtype=np.uint64)
        r, c = int((pid >> _R_SHIFT) & _MASK28), int(pid & _MASK28)
        out = []
        for dr in (0, 1):
            for dc in (0, 1):
                out.append(
                    (np.uint64(lvl + 1) << _L_SHIFT)
                    | (np.uint64(2 * r + dr) << _R_SHIFT)
                    | np.uint64(2 * c + dc)
                )
        return np.array(out, dtype=np.uint64)

    def root_ids(self):
        # level 0: 1 row x 2 cols
        return np.array([np.uint64(0), np.uint64(1)], dtype=np.uint64)

    def bbox(self, pid):
        pid = np.asarray(pid, dtype=np.uint64)
        lvl = (pid >> _L_SHIFT).astype(np.int64)
        rows = (np.int64(1) << lvl).astype(np.float64)
        r = ((pid >> _R_SHIFT) & _MASK28).astype(np.float64)
        c = (pid & _MASK28).astype(np.float64)
        dlat = 180.0 / rows
        dlon = 360.0 / (2.0 * rows)
        lat0 = -90.0 + r * dlat
        lon0 = -180.0 + c * dlon
        return lat0, lat0 + dlat, lon0, lon0 + dlon


register_grid("simple", SimpleGrid)
