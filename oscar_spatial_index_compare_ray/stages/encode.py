"""Grid-encode stage: add pixel-id columns to a points batch.

Engine analogue of ``sg().index(p.lat(), p.lon())`` per point
(src/OscarSgIndex.cpp:113-117,122-128), but vectorized over whole Arrow
batches instead of per-point virtual calls.  Stateless — plain function
tasks, no actor pool needed (grid objects are tiny and pickle cheaply).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..grids import get_grid


class GridEncode:
    """Callable adding ``<name>_cell: uint64`` per requested grid.

    Constructed once per task/actor; grids are instantiated in __init__
    so repeated batches share them (cheap here, but the pattern matches
    stateful stages)."""

    def __init__(self, grid_names: tuple[str, ...] = ("h3", "s2", "htm", "simple"),
                 level: int = 8, lat_col: str = "lat", lon_col: str = "lon"):
        self.grids = [(n, get_grid(n, default_level=level)) for n in grid_names]
        self.level = level
        self.lat_col = lat_col
        self.lon_col = lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        for name, g in self.grids:
            if len(lat):
                pid = g.encode(lat, lon, self.level)
            else:
                pid = np.empty(0, dtype=np.uint64)
            # store the uint64 bit pattern as int64 (two's complement view):
            # Arrow/Ray groupby and DuckDB BIGINT handle int64 natively, and
            # grid methods cast back losslessly.  Grouping/equality are
            # unaffected; only sort order of ids differs, which no engine
            # semantics depend on.
            batch = batch.append_column(
                f"{name}_cell", pa.array(pid.view(np.int64), pa.int64())
            )
        return batch
