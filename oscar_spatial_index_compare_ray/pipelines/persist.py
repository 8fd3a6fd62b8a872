"""Index persistence: build → partitioned parquet → query engine.

Re-creation of the reference's serialized static index
(include/hic/static-htm-index.h:28-37: versioned byte layout with
SpatialGridInfo {gridTypeId, defaultLevel, trixelId→htmIndex remap},
FlatTrie and payload arrays; writer src/OscarSearchSgIndex.cpp:414-490,
reader src/static-htm-index.cpp:18-28) as a *Parquet directory layout*:

    out_dir/
      INDEX_META.json     version, grid, level, supported_qts, counts
      text_index/         term, pixel, fm, n, items     (sorted by term)
      postings/           pixel, items, index_id
      trixel_data/        <grid>_cell, cell_id, items, n_items
      trixel_map/         pixel, trixel_id (dense uint32 remap —
                          the TrixelIdMap analogue,
                          include/hic/OscarSearchSgIndex.h:36-43)
      points/             doc_id, point_idx, lat, lon, pixel
      cells.parquet, regions.parquet   (copied polygon side)

Version checks on load mirror src/static-htm-index.cpp:19 (wrong
version → refuse).  Sorting text_index by term before write gives
parquet row-group statistics that let a loader prune row groups by term
range — the scale path for per-term predicate-pushdown reads.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..query.engine import QueryEngine
from ..sources.readers import read_small_arrow
from ..sources.synth import ensure_corpus
from .build_index import build_assignments, build_trixel_data
from .search import _to_arrow
from .text_index import build_pixel_postings, build_text_index, doc_pixels

INDEX_FORMAT_VERSION = 1


def save_index(
    sf_dir: str,
    out_dir: str,
    grid: str = "h3",
    level: int = 8,
    multiplier: int = 1,
    supported_qts: tuple[str, ...] = ("exact", "prefix", "suffix", "substring"),
) -> dict:
    """Run the full build (stage A + B) and persist the index."""
    corpus = ensure_corpus(sf_dir, multiplier)
    pixel_col = f"{grid}_cell"
    os.makedirs(out_dir, exist_ok=True)
    # write_parquet ADDS part files to an existing dir — a rebuild into
    # the same location must replace, not append
    for sub in ("text_index", "postings", "trixel_data", "points"):
        shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)

    assignments = build_assignments(
        corpus, grids=(grid,), level=level, with_tiles=False
    ).materialize()

    text_index = build_text_index(corpus, assignments, pixel_col)
    # deterministic order: sort by term before write → row-group pruning
    text_index.sort("term").write_parquet(os.path.join(out_dir, "text_index"))

    dp = doc_pixels(assignments, pixel_col)
    postings = build_pixel_postings(dp, pixel_col)
    postings.sort("pixel").write_parquet(os.path.join(out_dir, "postings"))

    build_trixel_data(assignments, pixel_col).write_parquet(
        os.path.join(out_dir, "trixel_data")
    )
    assignments.select_columns(
        ["doc_id", "point_idx", "lat", "lon", pixel_col]
    ).write_parquet(os.path.join(out_dir, "points"))

    # dense trixel-id remap (TrixelIdMap): pixel ids are sparse uint64;
    # downstream structures can use the compact uint32 id
    pix = np.sort(
        pq.read_table(os.path.join(out_dir, "postings"), columns=["pixel"])
        .column("pixel").to_numpy(zero_copy_only=False)
    )
    remap = pa.table(
        {
            "pixel": pa.array(pix, pa.int64()),
            "trixel_id": pa.array(np.arange(len(pix), dtype=np.uint32), pa.uint32()),
        }
    )
    pq.write_table(remap, os.path.join(out_dir, "trixel_map.parquet"))

    for name in ("cells", "regions"):
        shutil.copyfile(
            os.path.join(corpus, f"{name}.parquet"), os.path.join(out_dir, f"{name}.parquet")
        )

    meta = {
        "format_version": INDEX_FORMAT_VERSION,
        "grid": grid,
        "level": level,
        "supported_qts": list(supported_qts),
        "pixel_col": pixel_col,
        "n_pixels": int(len(pix)),
        "sf_dir": sf_dir,
        "multiplier": multiplier,
    }
    with open(os.path.join(out_dir, "INDEX_META.json"), "w") as f:
        json.dump(meta, f)
    return meta


def load_engine(out_dir: str) -> QueryEngine:
    """Open a persisted index (version-checked) as a QueryEngine."""
    with open(os.path.join(out_dir, "INDEX_META.json")) as f:
        meta = json.load(f)
    if meta.get("format_version") != INDEX_FORMAT_VERSION:
        # src/static-htm-index.cpp:19 analogue
        raise ValueError(
            f"index format version {meta.get('format_version')} != "
            f"supported {INDEX_FORMAT_VERSION}"
        )
    read = lambda name: pq.read_table(os.path.join(out_dir, name))  # noqa: E731
    return QueryEngine(
        text_index=read("text_index"),
        postings=read("postings"),
        trixel_data=read("trixel_data"),
        points=read("points"),
        cells_regions=read("cells.parquet").select(["cell_id", "region_id"]),
        region_names=read("regions.parquet").select(["region_id", "name"]),
        grid_name=meta["grid"],
        level=meta["level"],
        supported_qts=tuple(meta["supported_qts"]),
    )
