"""Index persistence: build → partitioned parquet → query engine.

Re-creation of the reference's serialized static index
(include/hic/static-htm-index.h:28-37: versioned byte layout with
SpatialGridInfo {gridTypeId, defaultLevel, trixelId→htmIndex remap},
FlatTrie and payload arrays; writer src/OscarSearchSgIndex.cpp:414-490,
reader src/static-htm-index.cpp:18-28) as a *Parquet directory layout*:

    out_dir/
      INDEX_META.json     version, grid, level, supported_qts, counts
      text_index/         term, pixel, fm, n, items     (sorted by term)
      postings/           pixel, items, index_id        (sorted by pixel)
      trixel_data/        <grid>_cell, cell_id, items   (sorted by cell_id)
      points/             doc_id, point_idx, lat, lon, pixel (sorted by lat)
      vocab.parquet       sorted distinct terms (FlatTrie string side)
      trixel_map.parquet  pixel, trixel_id (dense uint32 remap —
                          the TrixelIdMap analogue,
                          include/hic/OscarSearchSgIndex.h:36-43)
      cells.parquet, regions.parquet   (copied polygon side)

Version checks on load mirror src/static-htm-index.cpp:19 (wrong
version → refuse).  Every big table is sorted by its lookup key before
the write, and written with small row groups, so the loader
(query/backend.py ParquetBackend) prunes row groups by key-range
statistics and never materializes a full table — the engine's analogue
of the reference querying an mmap'd index without loading it
(src/static-htm-index.cpp:18-28).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray.data

from ..query.engine import QueryEngine
from ..sources.readers import read_small_arrow
from ..sources.synth import ensure_corpus
from .build_index import build_assignments, build_trixel_data
from .text_index import build_pixel_postings, build_text_index, doc_pixels

INDEX_FORMAT_VERSION = 3

# small row groups => fine-grained predicate-pushdown pruning at query
# time (a per-term lookup reads ~one row group, not a 1M-row file)
ROW_GROUP_SIZE = 64 * 1024

# Posting-list compression (the reference's RLE-delta ItemIndex format,
# T_RLE_DE: apps/main.cpp:153, writer src/OscarSearchSgIndex.cpp:561-577):
# posting lists are SORTED int64s, so parquet DELTA_BINARY_PACKED is the
# same delta-then-bitpack idea applied at the column-chunk level
# (measured: postings −40%, trixel_data −35% on the sf0.1 index, every
# column at-or-below its dictionary size; the read path is unchanged —
# parquet decodes transparently).  column_encoding requires
# use_dictionary=False for the file.
_DELTA_INT = "DELTA_BINARY_PACKED"
_ENCODINGS: dict[str, dict] = {
    # text_index deliberately keeps parquet's default DICTIONARY
    # encoding: the file is TERM-sorted, so its pixel/family columns are
    # high-entropy within a row group but low-cardinality overall —
    # dictionary beats delta there (measured: pixel 3.9 MB dict vs
    # 5.6 MB delta on the 1.07M-row sf0.1 index; term repeats across
    # rows, dict 77 KB).  Delta-bitpack only wins on the KEY-sorted
    # files below.
    "text_index": {},
    "postings": {
        "use_dictionary": False,
        "column_encoding": {
            "pixel": _DELTA_INT, "items.list.element": _DELTA_INT,
            "index_id": _DELTA_INT,
        },
    },
    "trixel_data": {
        "use_dictionary": False,
        "column_encoding": {
            "cell_id": _DELTA_INT, "items.list.element": _DELTA_INT,
            "n_items": _DELTA_INT,
        },
    },
}


def save_index(
    sf_dir: str,
    out_dir: str,
    grid: str = "h3",
    level: int = 8,
    multiplier: int = 1,
    supported_qts: tuple[str, ...] = ("exact", "prefix", "suffix", "substring"),
    compact_level: int = 0,
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

    # exchange sizing hints (stages/groupagg.exchange_coalesce_hint):
    # a small build's exchange inputs arrive as fixed-cost block dust;
    # pin partition counts from cheap row counts (parquet metadata /
    # the already-materialized assignments).  Token pairs are estimated
    # at ~400/page (measured ~215 text-index rows/page on the synthetic
    # corpus, families triple the join input) — only the ORDER matters:
    # the hint gates a fixed-cost optimization and turns itself off
    # past 64 partitions, so the at-scale plan is untouched.
    from ..stages.groupagg import exchange_coalesce_hint

    n_pages = pads.dataset(os.path.join(corpus, "pages.parquet")).count_rows()
    pairs_hint = exchange_coalesce_hint(n_pages * 400)
    points_hint = exchange_coalesce_hint(assignments.count())

    text_index = build_text_index(corpus, assignments, pixel_col, families=True,
                                  exchange_coalesce=pairs_hint)
    # deterministic order: sort by term before write → row-group pruning
    text_index.sort("term").write_parquet(
        os.path.join(out_dir, "text_index"), row_group_size=ROW_GROUP_SIZE,
        **_ENCODINGS["text_index"],
    )

    dp = doc_pixels(assignments, pixel_col, coalesce_to=points_hint)
    postings = build_pixel_postings(dp, pixel_col, coalesce_to=points_hint)
    postings.sort("pixel").write_parquet(
        os.path.join(out_dir, "postings"), row_group_size=ROW_GROUP_SIZE,
        **_ENCODINGS["postings"],
    )

    build_trixel_data(assignments, pixel_col, coalesce_to=points_hint).sort("cell_id").write_parquet(
        os.path.join(out_dir, "trixel_data"), row_group_size=ROW_GROUP_SIZE,
        **_ENCODINGS["trixel_data"],
    )
    # points sorted by LAT: geometry/kNN leaves prune by latitude band
    assignments.select_columns(
        ["doc_id", "point_idx", "lat", "lon", pixel_col]
    ).sort("lat").write_parquet(
        os.path.join(out_dir, "points"), row_group_size=ROW_GROUP_SIZE
    )

    # vocabulary sidecar (FlatTrie string side): stream the sorted term
    # column row-group-wise, C++ `unique` per group (rows are term-
    # sorted, so each group contributes a few distinct values; no
    # Python-object churn over the full index)
    import pyarrow.compute as pc

    vocab_parts: list[pa.Array] = []
    tdir = os.path.join(out_dir, "text_index")
    for f in sorted(os.listdir(tdir)):
        if not f.endswith(".parquet"):
            continue
        pf = pq.ParquetFile(os.path.join(tdir, f))
        for ri in range(pf.metadata.num_row_groups):
            col = pf.read_row_group(ri, columns=["term"]).column("term")
            vocab_parts.append(pc.unique(col.combine_chunks()))
    if vocab_parts:
        merged = pc.unique(pa.concat_arrays(vocab_parts))
        vocab_col = merged.take(pc.sort_indices(merged))
    else:
        vocab_col = pa.array([], pa.string())
    pq.write_table(
        pa.table({"term": vocab_col}), os.path.join(out_dir, "vocab.parquet")
    )

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

    # persisted HCQR payloads (apps/mainc.cpp:130-162 `hcqr` mode):
    # per-term compactified tree node rows derived from the text_index
    # files just written
    from ..grids import get_grid
    from .hcqr_index import save_hcqr_index

    save_hcqr_index(out_dir, get_grid(grid, default_level=level), level,
                    compact_level=compact_level)

    meta = {
        "format_version": INDEX_FORMAT_VERSION,
        "grid": grid,
        "level": level,
        "supported_qts": list(supported_qts),
        "pixel_col": pixel_col,
        "n_pixels": int(len(pix)),
        "sf_dir": sf_dir,
        "multiplier": multiplier,
        "has_families": True,
        "hcqr_compact_level": compact_level,
    }
    with open(os.path.join(out_dir, "INDEX_META.json"), "w") as f:
        json.dump(meta, f)
    return meta


def load_engine(out_dir: str) -> QueryEngine:
    """Open a persisted index (version-checked) as a QueryEngine served
    by row-group-pruned parquet reads — the index is NOT loaded into
    memory (src/static-htm-index.cpp:18-28 analogue)."""
    from ..query.backend import ParquetBackend

    with open(os.path.join(out_dir, "INDEX_META.json")) as f:
        meta = json.load(f)
    if meta.get("format_version") != INDEX_FORMAT_VERSION:
        # src/static-htm-index.cpp:19 analogue
        raise ValueError(
            f"index format version {meta.get('format_version')} != "
            f"supported {INDEX_FORMAT_VERSION}"
        )
    eng = QueryEngine(
        ParquetBackend(out_dir, meta["pixel_col"],
                       has_families=bool(meta.get("has_families"))),
        grid_name=meta["grid"],
        level=meta["level"],
        supported_qts=tuple(meta["supported_qts"]),
    )
    eng.index_dir = out_dir  # lets callers open sibling artifacts (hcqr/)
    return eng
