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
