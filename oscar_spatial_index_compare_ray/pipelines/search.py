"""Assemble a QueryEngine from the built index tables.

The reference's query apps mmap pre-built index files
(apps/mainq.cpp:601-670); here the builder pipelines run (or their
parquet outputs load) and the small derived tables feed the engine.
Engines are cached per (sf_dir, grid, level, multiplier) so a REPL/test
session builds once.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..query.engine import QueryEngine
from ..sources.readers import read_small_arrow
from ..sources.synth import ensure_corpus
from .build_index import build_assignments, build_trixel_data
from .text_index import build_pixel_postings, build_text_index, doc_pixels

_ENGINE_CACHE: dict[tuple, QueryEngine] = {}


def _to_arrow(ds: ray.data.Dataset) -> pa.Table:
    """Collect a SMALL dataset driver-side as one Arrow table (list
    columns stay Arrow — no pandas tensor casting)."""
    import ray as _ray

    blocks = _ray.get(ds.to_arrow_refs())
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        return _ray.get(ds.to_arrow_refs())[0]
    return pa.concat_tables(blocks, promote_options="default").combine_chunks()


def build_query_engine(
    sf_dir: str,
    grid: str = "h3",
    level: int = 8,
    multiplier: int = 1,
    supported_qts: tuple[str, ...] = ("exact", "prefix", "suffix", "substring"),
) -> QueryEngine:
    key = (sf_dir, grid, level, multiplier, supported_qts)
    if key in _ENGINE_CACHE:
        return _ENGINE_CACHE[key]
    corpus = ensure_corpus(sf_dir, multiplier)
    pixel_col = f"{grid}_cell"
    assignments = build_assignments(
        corpus, grids=(grid,), level=level, with_tiles=False
    ).materialize()

    text_index = _to_arrow(build_text_index(corpus, assignments, pixel_col))
    dp = doc_pixels(assignments, pixel_col)
    postings = _to_arrow(build_pixel_postings(dp, pixel_col))
    trixels = _to_arrow(build_trixel_data(assignments, pixel_col))
    points = _to_arrow(
        assignments.select_columns(["doc_id", "point_idx", "lat", "lon", pixel_col])
    )
    cells = read_small_arrow(corpus, "cells").select(["cell_id", "region_id"])
    regions = read_small_arrow(corpus, "regions").select(["region_id", "name"])

    eng = QueryEngine(
        text_index=text_index,
        postings=postings,
        trixel_data=trixels,
        points=points,
        cells_regions=cells,
        region_names=regions,
        grid_name=grid,
        level=level,
        supported_qts=supported_qts,
    )
    _ENGINE_CACHE[key] = eng
    return eng
