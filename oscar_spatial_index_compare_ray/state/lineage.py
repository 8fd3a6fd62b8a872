"""Resumable partitioned output + per-partition lineage & metrics.

North-rule requirement (BASELINE.json): "resumable from checkpoint,
per-partition lineage + metrics".  The reference has no
retry/checkpoint story at all (single-run, SURVEY.md §4) — this module
is the engine's explicit design for it:

  - Output layout: ``out_dir/part=<key>/data.parquet`` — one directory
    per deterministic partition key (hash bucket, shard id or key
    range), written ATOMICALLY (tmp file + rename).
  - ``MANIFEST.jsonl``: one line per finished partition with metrics
    (rows, bytes, wall seconds) and lineage (input description,
    pipeline version).  A partition listed in the manifest is final.
  - Resume: rerunning the same write skips partitions already in the
    manifest — the filter happens INSIDE the pipeline (broadcast set of
    done keys pruned in a map_batches), so a 99%-done 100 TB job only
    streams the missing 1%.

The partition key must be a deterministic function of the data (e.g.
``hash(doc_id) % N``), never of execution order.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


def add_shard_column(ds: ray.data.Dataset, key_col: str, num_shards: int,
                     shard_col: str = "shard") -> ray.data.Dataset:
    """Deterministic partition key: splitmix64(key) % num_shards."""
    from ..functions.hashing import splitmix64

    def add(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        s = (splitmix64(k.view(np.uint64)) % np.uint64(num_shards)).astype(np.int32)
        return batch.append_column(shard_col, pa.array(s, pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "MANIFEST.jsonl")


def load_manifest(out_dir: str) -> dict[int, dict]:
    """Finished partitions: shard → manifest entry."""
    done: dict[int, dict] = {}
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            for line in f:
                if line.strip():
                    e = json.loads(line)
                    done[e["shard"]] = e
    return done


def write_resumable(
    ds: ray.data.Dataset,
    out_dir: str,
    num_shards: int,
    key_col: str = "doc_id",
    lineage: dict | None = None,
) -> dict:
    """Write ``ds`` to ``out_dir`` in ``num_shards`` partitions,
    skipping those already in the manifest.  Returns a summary dict.

    Each shard is written by its own task (groupby shard → map_groups
    writer actor-side), metrics returned through the dataset, the
    manifest appended once per completed shard by the driver."""
    os.makedirs(out_dir, exist_ok=True)
    done = load_manifest(out_dir)
    todo_mask_ref = ray.put(frozenset(int(s) for s in done))

    ds = add_shard_column(ds, key_col, num_shards)

    def prune(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        done_set = ray.get(todo_mask_ref)
        if not done_set:
            return batch
        keep = ~np.isin(
            batch.column("shard").to_numpy(zero_copy_only=False), list(done_set)
        )
        return batch.filter(pa.array(keep))

    ds = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)

    def write_shard(group: pa.Table) -> pa.Table:
        shard = int(group.column("shard")[0].as_py())
        t0 = time.perf_counter()
        part_dir = os.path.join(out_dir, f"part={shard:05d}")
        os.makedirs(part_dir, exist_ok=True)
        tmp = os.path.join(part_dir, f".tmp-{uuid.uuid4().hex}.parquet")
        final = os.path.join(part_dir, "data.parquet")
        pq.write_table(group.drop_columns(["shard"]), tmp)
        os.replace(tmp, final)  # atomic publish
        return pa.table(
            {
                "shard": pa.array([shard], pa.int32()),
                "rows": pa.array([group.num_rows], pa.int64()),
                "bytes": pa.array([os.path.getsize(final)], pa.int64()),
                "seconds": pa.array([round(time.perf_counter() - t0, 4)], pa.float64()),
            }
        )

    metrics = ds.groupby("shard").map_groups(write_shard, batch_format="pyarrow").take_all()

    with open(_manifest_path(out_dir), "a") as f:
        for m in metrics:
            entry = dict(m)
            entry["lineage"] = lineage or {}
            f.write(json.dumps(entry) + "\n")

    all_done = load_manifest(out_dir)
    return {
        "written_shards": len(metrics),
        "skipped_shards": len(done),
        "total_shards_done": len(all_done),
        "rows_written": int(sum(m["rows"] for m in metrics)),
    }


def read_resumable(out_dir: str) -> ray.data.Dataset:
    """Read back only manifest-committed partitions."""
    done = load_manifest(out_dir)
    paths = [
        os.path.join(out_dir, f"part={s:05d}", "data.parquet") for s in sorted(done)
    ]
    return ray.data.read_parquet(paths)
