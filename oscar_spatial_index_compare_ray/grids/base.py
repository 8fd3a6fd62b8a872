"""Abstract spatial grid + registry.

Re-creation of the reference's ``SpatialGrid`` interface — 14 virtuals
implemented 4× (include/hic/H3SpatialGrid.h:14-30, src/HtmSpatialGrid.cpp,
src/S2GeomSpatialGrid.cpp, plus the vendored SimpleGridSpatialGrid,
src/SpatialGridInitializer.cpp:13) — as a Python ABC whose methods are
**vectorized over numpy arrays** so they run inside
``map_batches(batch_format="pyarrow")`` with no per-row Python.

Pixel ids are uint64.  Every grid must satisfy, for all valid inputs:
  - ``encode`` is deterministic and total (every (lat, lon) maps to
    exactly one pixel per level);
  - ``parent(encode(p, L), 1) == encode_at_parent`` consistency is
    *approximate* for the hex grid (like H3's h3ToParent) and exact for
    the subdivision grids (HTM/S2-style/simple), mirroring the
    reference's semantics (src/HtmSpatialGrid.cpp:100-112 exact shift,
    src/H3SpatialGrid.cpp:94-106 library parent);
  - ``is_ancestor`` agrees with iterated ``parent``
    (src/H3SpatialGrid.cpp:49-62).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np


class Grid(ABC):
    name: str = "abstract"
    max_level: int = 30
    default_level: int = 8  # reference default level 8, apps/main.cpp:23

    # --- core -----------------------------------------------------------
    @abstractmethod
    def encode(self, lat: np.ndarray, lon: np.ndarray, level: int | None = None) -> np.ndarray:
        """(lat°, lon°) arrays → uint64 pixel ids at ``level``."""

    @abstractmethod
    def level(self, pid: np.ndarray) -> np.ndarray:
        """pixel ids → uint8 levels."""

    @abstractmethod
    def parent(self, pid: np.ndarray, steps: int = 1) -> np.ndarray:
        """ids → ancestor ids ``steps`` levels up (root-level ids fixed)."""

    @abstractmethod
    def children(self, pid: int) -> np.ndarray:
        """One pixel id → its direct children ids."""

    @abstractmethod
    def root_ids(self) -> np.ndarray:
        """Top-level pixel ids."""

    @abstractmethod
    def bbox(self, pid: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """ids → (lat_min, lat_max, lon_min, lon_max) degree arrays."""

    # --- derived (shared implementations) -------------------------------
    def children_count(self, pid: int) -> int:
        return len(self.children(pid))

    def is_ancestor(self, anc: np.ndarray, desc: np.ndarray) -> np.ndarray:
        """Vectorized ancestor test via iterated parent (src/H3SpatialGrid.cpp:49-62)."""
        anc = np.asarray(anc, dtype=np.uint64)
        cur = np.asarray(desc, dtype=np.uint64).copy()
        out = cur == anc
        la = self.level(anc).astype(np.int64)
        for _ in range(self.max_level):
            lc = self.level(cur).astype(np.int64)
            todo = (lc > la) & ~out
            if not todo.any():
                break
            cur = np.where(todo, self.parent(cur), cur)
            out |= cur == anc
        return out

    def area_km2(self, pid: np.ndarray) -> np.ndarray:
        """Approximate pixel area from its bbox (equirectangular, cos-lat
        corrected) — the analogue of the reference's approximate areas
        (src/HtmSpatialGrid.cpp:135-142 bounding-circle,
        src/S2GeomSpatialGrid.cpp:119-126 ApproxArea)."""
        lat0, lat1, lon0, lon1 = self.bbox(pid)
        km_per_deg = 111.195
        mid = np.radians((lat0 + lat1) / 2.0)
        return (lat1 - lat0) * km_per_deg * (lon1 - lon0) * km_per_deg * np.cos(mid)

    def cover_bbox(self, lat_min: float, lat_max: float, lon_min: float, lon_max: float,
                   level: int | None = None, max_cells: int | None = None) -> np.ndarray | None:
        """All level-``level`` pixels whose bbox intersects the query box.

        Generic BFS refinement from the roots — the ``tree(begin, end)``
        capability left unimplemented in all three reference grids
        (src/H3SpatialGrid.cpp:118-122 etc.); needed here for the
        geometry query leaves and kNN ring expansion.

        ``max_cells``: abort and return None once the frontier exceeds
        the budget — callers then retry at a coarser level (wide covers
        at fine levels would otherwise explode combinatorially).
        """
        if level is None:
            level = self.default_level
        frontier = self.root_ids()
        for _ in range(self.max_level + 1):
            la0, la1, lo0, lo1 = self.bbox(frontier)
            hit = (la1 >= lat_min) & (la0 <= lat_max) & (lo1 >= lon_min) & (lo0 <= lon_max)
            frontier = frontier[hit]
            if max_cells is not None and len(frontier) > max_cells:
                return None
            levels = self.level(frontier)
            if len(frontier) == 0 or (levels >= level).all():
                break
            done = frontier[levels >= level]
            expand = frontier[levels < level]
            kids = [self.children(int(p)) for p in expand]
            frontier = np.concatenate([done] + kids) if kids else done
        return np.unique(frontier)


_REGISTRY: dict[str, type[Grid]] = {}


def register_grid(name: str, cls: type[Grid]) -> None:
    """Name → factory registration, the engine's user-extension hook
    (SpatialGridRegistry, src/SpatialGridInitializer.cpp:9-18)."""
    _REGISTRY[name] = cls


def get_grid(name: str, **kwargs) -> Grid:
    try:
        return _REGISTRY[name](**kwargs)
    except KeyError:
        raise KeyError(f"unknown grid {name!r}; registered: {sorted(_REGISTRY)}") from None


def grid_names() -> list[str]:
    return sorted(_REGISTRY)
