"""Pluggable pipeline sinks — the FlusherType analogue.

The reference's index builder parameterizes its output flusher
(``FlusherType {FT_IN_MEMORY, FT_NO_OP}`` + a ``WorkerBase.flush``
virtual, include/hic/OscarSearchSgIndex.h:44,110,126-163): the same
build can materialize in RAM, serialize to files, or discard results
(pure benchmarking).  Engine equivalents:

    memory   → ds.materialize()                 (FT_IN_MEMORY)
    parquet  → resumable partitioned write      (SerializationFlusher)
    noop     → consume + count, keep nothing    (FT_NO_OP)
"""

from __future__ import annotations

from typing import Any

import ray.data


def run_with_sink(ds: ray.data.Dataset, sink: str = "memory", *,
                  out_dir: str | None = None, num_shards: int = 16,
                  key_col: str = "doc_id", lineage: dict | None = None) -> Any:
    if sink == "memory":
        return ds.materialize()
    if sink == "parquet":
        if not out_dir:
            raise ValueError("parquet sink needs out_dir")
        from ..state.lineage import write_resumable

        return write_resumable(ds, out_dir, num_shards, key_col=key_col, lineage=lineage)
    if sink == "noop":
        return ds.count()
    raise ValueError(f"unknown sink {sink!r}; use memory | parquet | noop")
