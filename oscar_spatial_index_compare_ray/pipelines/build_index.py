"""Index-construction pipelines — stage A/B of the reference re-expressed
as Ray Data graphs (SURVEY.md §3.1).

Reference stage A (src/OscarSgIndex.cpp:53-207): per item per point,
PIP + grid assignment, dedup (pixel, cell, item) triples, group to
TrixelData/CellTrixelMap.  Here:

    read_parquet(pages)                         # prune: html, doc_id
      → map_batches(extract_and_explode)        # html→text→points, fused
      → map_batches(GridEncode)                 # vectorized pixel ids
      → map_batches(PipAssign, concurrency=N)   # actor pool, broadcast cells
      → [dedup (pixel, cell, doc) per batch]    # partial combine
      → groupby(pixel, cell)                    # THE wide shuffle (#1)
      → sorted-unique item posting lists        # TrixelData analogue

All intermediate batches are Arrow; nothing materializes the full
dataset driver-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..sources.readers import read_pages, read_small_arrow
from ..sources.synth import TILE_COLS, TILE_ROWS, tile_id_of
from ..stages.encode import GridEncode
from ..stages.extract import extract_and_explode
from ..stages.pip import PipAssign

DEFAULT_GRIDS = ("h3", "s2", "htm", "simple")


def add_tile_id(batch: pa.Table) -> pa.Table:
    """Raster tile key (coarse uniform grid) — the computed join key of
    the raster-tile ↔ vector join (SURVEY.md §2.5)."""
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    tid = tile_id_of(lat, lon) if len(lat) else np.empty(0, np.int64)
    return batch.append_column("tile_id", pa.array(tid, pa.int64()))


def dedup_triples(batch: pa.Table, keys: list[str]) -> pa.Table:
    """Per-batch partial dedup BEFORE the shuffle — the engine's version
    of the reference's per-worker dedup cache (src/OscarSgIndex.cpp:
    113,133-157): cuts shuffle volume without any global mutable state."""
    return batch.group_by(keys).aggregate([])


def build_points(corpus_dir: str, *, concurrency: int | None = None) -> ray.data.Dataset:
    """pages → exploded geotag points (doc_id, point_idx, lat, lon)."""
    ds = read_pages(corpus_dir, columns=["html", "doc_id"])
    return ds.map_batches(extract_and_explode, batch_format="pyarrow", zero_copy_batch=True)


def build_assignments(
    corpus_dir: str,
    grids: tuple[str, ...] = DEFAULT_GRIDS,
    level: int = 8,
    *,
    pip_concurrency: int | tuple[int, int] = (2, 16),
    with_tiles: bool = True,
) -> ray.data.Dataset:
    """The flagship spatial-join + cell-assignment pipeline.

    Output rows: doc_id, point_idx, lat, lon, <grid>_cell per grid,
    cell_id (polygon partition, sentinel 0), [tile_id]."""
    pts = build_points(corpus_dir)
    pts = pts.map_batches(
        GridEncode(grid_names=grids, level=level),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cells = read_small_arrow(corpus_dir, "cells")
    cells_ref = ray.put(cells.select(["cell_id", "polygon"]))
    # task-based PIP (per-process cached index): elastic across any CPU
    # count — the actor-pool variant (PipAssign) is for heavy state
    from ..stages.pip import make_pip_task

    pts = pts.map_batches(
        make_pip_task(cells_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if with_tiles:
        pts = pts.map_batches(add_tile_id, batch_format="pyarrow", zero_copy_batch=True)
    return pts


def build_trixel_data(assignments: ray.data.Dataset, pixel_col: str = "h3_cell",
                      num_blocks: int = 32,
                      coalesce_to: int | None = None) -> ray.data.Dataset:
    """TrixelData analogue: (pixel, cell) → sorted unique item list
    (src/OscarSgIndex.cpp:147-157,184-191).

    Per-batch triple dedup (combiner) → hash repartition by (pixel,
    cell) → vectorized per-block list collect.  NO per-group Python:
    the naive ``groupby().map_groups`` variant measured 254 s at sf0.1
    vs <10 s for this pattern (see stages/groupagg.py)."""
    from ..stages.groupagg import grouped_sorted_unique_lists

    slim = assignments.select_columns([pixel_col, "cell_id", "doc_id"])
    slim = slim.map_batches(
        lambda b: dedup_triples(b, [pixel_col, "cell_id", "doc_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return grouped_sorted_unique_lists(
        slim, [pixel_col, "cell_id"], "doc_id", num_partitions=num_blocks,
        out_schema=pa.schema([
            (pixel_col, pa.int64()), ("cell_id", pa.uint32()),
            ("items", pa.list_(pa.int64())), ("n_items", pa.int64()),
        ]),
        coalesce_to=coalesce_to,
    )


def build_cell_trixel_map(assignments: ray.data.Dataset, pixel_col: str = "h3_cell",
                          num_blocks: int = 32) -> ray.data.Dataset:
    """CellTrixelMap analogue: cell → sorted unique pixel list
    (src/OscarSgIndex.cpp:151, OscarSgIndex.h:17,31-32)."""
    from ..stages.groupagg import grouped_sorted_unique_lists

    slim = assignments.select_columns(["cell_id", pixel_col])
    slim = slim.map_batches(
        lambda b: dedup_triples(b, ["cell_id", pixel_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return grouped_sorted_unique_lists(
        slim, ["cell_id"], pixel_col, num_partitions=num_blocks,
        out_col="pixels", count_col="n_pixels",
        out_schema=pa.schema([
            ("cell_id", pa.uint32()), ("pixels", pa.list_(pa.int64())),
            ("n_pixels", pa.int64()),
        ]),
    )


def pixel_stats(trixel_data: ray.data.Dataset, pixel_col: str = "h3_cell") -> dict:
    """Index distribution stats (src/OscarSgIndex.cpp:210-237 analogue):
    per-pixel item counts and cell counts.  Returns a small dict (the
    final ``aggregate`` materializes only the scalar summary)."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    per_pixel = trixel_data.groupby(pixel_col).aggregate(
        Sum("n_items", alias_name="items"), Count(alias_name="cells")
    )
    return per_pixel.aggregate(
        Count(alias_name="pixels"),
        Mean("items", alias_name="mean_items"),
        Min("items", alias_name="min_items"),
        Max("items", alias_name="max_items"),
        Mean("cells", alias_name="mean_cells"),
        Max("cells", alias_name="max_cells"),
    )
