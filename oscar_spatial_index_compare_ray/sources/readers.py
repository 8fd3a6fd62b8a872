"""Parquet readers (corpus + driver test tables) as Ray Datasets.

Engine analogue of the reference's corpus reader
(``cmp->setAllFilesFromPrefix(f); cmp->energize()``,
apps/main.cpp:111-121): here, ``ray.data.read_parquet`` with explicit
column pruning — a read that loads all columns for a 2-column transform
is wrong at 100 TB.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import ray.data


def read_pages(corpus_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(corpus_dir, "pages.parquet"), columns=columns)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def read_small_arrow(path_dir: str, name: str):
    """Driver-side load of a SMALL table (regions/cells/tiles) destined
    for ``ray.put`` broadcast — never used on big tables."""
    return pq.read_table(os.path.join(path_dir, f"{name}.parquet"))
