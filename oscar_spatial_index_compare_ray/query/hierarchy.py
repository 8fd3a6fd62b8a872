"""Region hierarchy with a pluggable cost function.

Re-creation of the reference's GeoHierarchy HCQR completer
(src/GeoHierarchyHCQRCompleter.cpp:18-33): a region can be answered
either DIRECTLY (one precomputed region posting list) or DECOMPOSED
(union of its cells' lists).  Which is cheaper depends on a cost
function — the reference's hook multiplies the cost of non-admin
regions by 100 so only administrative areas use the direct path
(src/GeoHierarchyHCQRCompleter.cpp:84-106,112-115).  ``cost_fn`` here
is the same user-extension point (SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

# cost_fn(region_id, admin_level, n_cells) -> float cost of the DIRECT path
CostFn = Callable[[int, int | None, int], float]


def default_cost(region_id: int, admin_level: int | None, n_cells: int) -> float:
    """Reference default: direct-path cost 1 per region, ×100 when the
    region is not an administrative area (admin_level null)."""
    base = 1.0
    if admin_level is None:
        base *= 100.0
    return base


class RegionHierarchy:
    def __init__(self, cells_regions: pa.Table, regions: pa.Table,
                 cost_fn: CostFn = default_cost):
        self.cost_fn = cost_fn
        self.cells_of: dict[int, list[int]] = {}
        for cid, rid in zip(
            cells_regions.column("cell_id").to_pylist(),
            cells_regions.column("region_id").to_pylist(),
        ):
            self.cells_of.setdefault(int(rid), []).append(int(cid))
        self.admin_level: dict[int, int | None] = dict(
            zip(regions.column("region_id").to_pylist(),
                regions.column("admin_level").to_pylist())
        )
        self.name_of: dict[int, str] = dict(
            zip(regions.column("region_id").to_pylist(),
                regions.column("name").to_pylist())
        )

    def plan(self, region_id: int) -> str:
        """'direct' | 'cells': the cheaper evaluation path per cost_fn.
        Decomposed cost = number of cell lookups; direct cost = cost_fn."""
        n_cells = len(self.cells_of.get(region_id, []))
        direct = self.cost_fn(region_id, self.admin_level.get(region_id), n_cells)
        return "direct" if direct < n_cells else "cells"

    def region_docs(self, engine, region_id: int) -> np.ndarray:
        """Flattened docs of a region via the planned path (both paths
        produce identical results; tests assert it)."""
        name = self.name_of.get(region_id)
        if name is None:
            return np.empty(0, np.int64)
        if self.plan(region_id) == "direct":
            if not hasattr(self, "_direct"):
                self._direct: dict[int, np.ndarray] = {}
            if region_id not in self._direct:
                self._direct[region_id] = engine._region_cqr(name).flaten()
            return self._direct[region_id]
        out = engine._empty()
        for cid in self.cells_of.get(region_id, []):
            out = out.union(engine._cell_cqr(cid))
        return out.flaten()
