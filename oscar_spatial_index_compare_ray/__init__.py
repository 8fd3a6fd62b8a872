"""oscar_spatial_index_compare_ray — a Ray-Data-native spatial indexing
and join engine.

From-scratch re-creation of the query/data-processing capabilities of
``dbahrdt/oscar-spatial-index-compare`` (a C++ harness comparing
hierarchical spatial-grid indexes — HTM/H3/S2/simple grid — for
cell-based geo-text search), re-expressed over ``ray.data.Dataset``
pipelines on Common-Crawl-style web-page Parquet tables.

Layout:
  functions/  pure, deterministic per-batch kernels (text extraction,
              geotag parsing, tokenizing, hashing, text stats)
  grids/      vectorized spatial-grid encoders + registry
              (reference: src/{Htm,H3,S2Geom}SpatialGrid.cpp)
  sources/    synthetic deterministic corpus generator + parquet readers
  stages/     Ray Data map_batches stages (stateless fns + actor pools)
  pipelines/  end-to-end build/query pipelines (Dataset graphs)
  query/      op-tree parser, CQR/HCQR algebra, query engine
              (reference: src/OscarSearchWithSg.cpp, src/HcqrOpTree.cpp)
  state/      lineage / resumable-output helpers
"""

__version__ = "0.1.0"


def _empty_schema_drift_filter(record) -> bool:
    """Drop Ray's cosmetic 'RefBundle with a different schema …
    new schema: .' warning — and ONLY that one.

    Every engine exchange already emits TYPED empty blocks
    (``out_schema.empty_table()`` in ``stages/groupagg._partitioned_apply``
    and friends), but two schema-less-empty sources live INSIDE Ray's
    sort machinery and are unreachable from user code (verified against
    ray 2.49 sources): (a) an empty sort RANGE builds its reduce block
    from zero inputs → no schema; (b) the map batcher SKIPS 0-row input
    blocks entirely, so the UDF never runs and the task emits an
    untyped empty output bundle.  Both are harmless here — every
    downstream stage types its empties and the joins route through
    ``_retyped`` — so the warning is pure noise on hot-key workloads.
    Real schema drift (a non-empty mismatched schema) still warns."""
    msg = record.getMessage()
    return not (
        "RefBundle with a different schema" in msg and "new schema: ." in msg
    )


def _install_log_filter() -> None:
    import logging

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_empty_schema_drift_filter)


_install_log_filter()
