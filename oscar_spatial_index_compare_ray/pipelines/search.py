"""Assemble a QueryEngine for an sf_dir.

The reference's query apps mmap pre-built index files
(apps/mainq.cpp:601-670); here `build_query_engine` runs the build
pipelines ONCE per (sf_dir, grid, level, multiplier), streams the index
to a partitioned-parquet layout (pipelines/persist.py — nothing is
materialized driver-side), and serves queries from the persisted files
through row-group-pruned reads (query/backend.py ParquetBackend).
Engines are cached per key so a REPL/test session builds once.
"""

from __future__ import annotations

import hashlib
import os

from ..query.engine import QueryEngine

_ENGINE_CACHE: dict[tuple, QueryEngine] = {}

INDEX_CACHE_ROOT = "/tmp/osiray_indexes"


def index_dir_for(sf_dir: str, grid: str, level: int, multiplier: int,
                  supported_qts: tuple[str, ...]) -> str:
    # key on the VERSIONED corpus cache dir (embeds GENERATOR_VERSION),
    # so a generator bump invalidates persisted indexes too
    from ..sources.synth import ensure_corpus

    corpus = ensure_corpus(sf_dir, multiplier)
    key = f"{corpus}|{grid}|{level}|{multiplier}|{','.join(supported_qts)}"
    h = hashlib.md5(key.encode()).hexdigest()[:12]
    return os.path.join(INDEX_CACHE_ROOT, f"{os.path.basename(sf_dir)}_{grid}_l{level}_{h}")


def build_query_engine(
    sf_dir: str,
    grid: str = "h3",
    level: int = 8,
    multiplier: int = 1,
    supported_qts: tuple[str, ...] = ("exact", "prefix", "suffix", "substring"),
) -> QueryEngine:
    from .persist import INDEX_FORMAT_VERSION, load_engine, save_index

    key = (sf_dir, grid, level, multiplier, supported_qts)
    if key in _ENGINE_CACHE:
        return _ENGINE_CACHE[key]
    out_dir = index_dir_for(sf_dir, grid, level, multiplier, supported_qts)
    meta_path = os.path.join(out_dir, "INDEX_META.json")
    fresh = False
    if os.path.exists(meta_path):
        import json

        with open(meta_path) as f:
            meta = json.load(f)
        fresh = meta.get("format_version") == INDEX_FORMAT_VERSION
    if not fresh:
        save_index(sf_dir, out_dir, grid=grid, level=level,
                   multiplier=multiplier, supported_qts=supported_qts)
    eng = load_engine(out_dir)
    _ENGINE_CACHE[key] = eng
    return eng
