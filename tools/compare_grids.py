"""Grid-index comparison harness — the reference's CORE mission
(`osi-compare`: HTM vs H3 vs S2 vs simple grid as OSCAR cell-index
replacements; differential check apps/main.cpp:193-205, benchmark
apps/mainq.cpp:175-376) as one engine run.

For every registered grid: build + persist the index, verify that every
query's flattened doc set matches every other grid's EXACTLY (the
cross-grid differential — the whole point of the reference), then time
per-query CQR construction and flatten separately (apps/mainq.cpp:
694-703 split) and report the distribution plus index size on disk
(static-htm-index.cpp:38-41).

Usage:  python tools/compare_grids.py [sf_dir] [level]
Prints one JSON line per grid plus a `cross_grid_identical` verdict.
"""

from __future__ import annotations

import json
import os
import sys
import time


# NOTE: no `$full(...)` here — full-match promotion is PIXEL-granular,
# so its flattened set depends on the grid BY DEFINITION (a coarser
# pixel promotes more co-located docs), exactly as the reference's
# allToFull does; the cross-grid invariant covers the doc-level query
# semantics, not cell-granular promotions.
QUERIES = [
    "table", "tab*", "table + window", "table window", "table - window",
    "table ^ window", "(table + window) - merge", "$region:region_001 table",
    "$rect:45.0,5.0,52.0,15.0 table", "$item:table", "$near:48.7,9.1,25",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from oscar_spatial_index_compare_ray.grids import grid_names
    from oscar_spatial_index_compare_ray.pipelines.search import (
        build_query_engine,
        index_dir_for,
    )

    results = {}
    flat_sets: dict[str, dict[str, tuple]] = {}
    for g in grid_names():
        t0 = time.perf_counter()
        eng = build_query_engine(sf_dir, grid=g, level=level)
        build_s = time.perf_counter() - t0
        idx_dir = eng.index_dir
        size = 0
        for root, _dirs, files in os.walk(idx_dir):
            size += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        cqr_us, flat_us, items_n = [], [], []
        per_query: dict[str, tuple] = {}
        for q in QUERIES:
            eng.complete(q).flaten()  # warm-up (mainq.cpp:206-214)
            t0 = time.perf_counter()
            cqr = eng.complete(q)
            cqr_us.append((time.perf_counter() - t0) * 1e6)
            t0 = time.perf_counter()
            items = cqr.flaten()
            flat_us.append((time.perf_counter() - t0) * 1e6)
            items_n.append(len(items))
            per_query[q] = tuple(items.tolist())
        flat_sets[g] = per_query
        results[g] = {
            "grid": g,
            "build_s": round(build_s, 2),
            "index_KiB": round(size / 1024, 1),
            "pixels": int(eng.cell_size()),
            "cqr_us_mean": round(sum(cqr_us) / len(cqr_us), 0),
            "cqr_us_max": round(max(cqr_us), 0),
            "flatten_us_mean": round(sum(flat_us) / len(flat_us), 0),
            "items_total": int(sum(items_n)),
        }
        print(json.dumps(results[g]))

    # the differential: every grid must flatten every query identically
    # (apps/main.cpp:193-205 exact set compare, generalized pairwise)
    grids = list(flat_sets)
    identical = all(
        flat_sets[grids[0]][q] == flat_sets[g][q]
        for g in grids[1:] for q in QUERIES
    )
    print(json.dumps({
        "cross_grid_identical": identical,
        "grids": grids,
        "queries": len(QUERIES),
        "sf": sf_dir,
        "level": level,
    }))
    if not identical:
        for q in QUERIES:
            sets = {g: set(flat_sets[g][q]) for g in grids}
            base = sets[grids[0]]
            for g in grids[1:]:
                if sets[g] != base:
                    print(f"DIFF {q!r}: {grids[0]}-only={len(base - sets[g])} "
                          f"{g}-only={len(sets[g] - base)}", file=sys.stderr)
        raise SystemExit(1)
    ray.shutdown()


if __name__ == "__main__":
    main()
