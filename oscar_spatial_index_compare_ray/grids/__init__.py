"""Spatial grids + registry (reference: src/SpatialGridInitializer.cpp:9-18).

Importing this package registers the four built-in grids, mirroring the
reference's static-init registration of "h3"/"htm"/"s2geom"/simple grid
(src/H3SpatialGrid.cpp:9-14, src/HtmSpatialGrid.cpp:11-16,
src/S2GeomSpatialGrid.cpp:12-17).
"""

from .base import Grid, get_grid, grid_names, register_grid
from .h3 import H3Grid
from .htm import HTMGrid
from .s2 import S2Grid
from .simple import SimpleGrid

__all__ = [
    "Grid",
    "get_grid",
    "grid_names",
    "register_grid",
    "SimpleGrid",
    "HTMGrid",
    "S2Grid",
    "H3Grid",
]
