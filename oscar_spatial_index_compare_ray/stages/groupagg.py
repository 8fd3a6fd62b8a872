"""Vectorized grouped aggregation — the engine's high-throughput
replacement for per-group Python.

``Dataset.groupby(KEYS).map_groups(fn)`` calls ``fn`` once per group; at
~10⁶ tiny (pixel, cell) groups the per-group Python dominates wall time
(measured 254 s vs <10 s for the join itself at sf0.1).  The scalable
pattern used here:

    ds.map_batches(add '__khash' = splitmix64(keys))    # deterministic
      .sort('__khash')                                   # range exchange
      .map_batches(vectorized_partition_agg,             # whole reduce
                   batch_size=None)                      # partition at once

Equal keys share a hash; Ray's sort range-partitioner never splits
equal sort values across partitions, and each reduce partition arrives
as exactly ONE block (ArrowBlockAccessor.merge_sorted_blocks returns a
single table) — so with ``batch_size=None`` every key group is complete
inside its batch and can be aggregated independently.  Inside, the work
is pure Arrow/NumPy: pyarrow's C++
``Table.group_by().aggregate([... 'list'])`` collects per-group lists,
then one lexsort + first-occurrence mask sorts and dedups ALL lists at
once (offsets arithmetic, no Python loop).  This mirrors the
reference's sort+unique post-pass (src/OscarSgIndex.cpp:184-191) at
partition granularity.

Sorting on the FULL 64-bit hash (not ``hash % P``) keeps the sort key
high-cardinality, so the sampled range boundaries are distinct and no
reduce partition is empty — Ray's sort/map_groups path emits
schema-less empty blocks for empty range partitions (a few-distinct-
values sort key guarantees them), which triggered "RefBundle with a
different schema" warnings in round 1.  Partition count equals the
upstream block count, so parallelism and per-task memory follow the
input partitioning.  (Ray 2.49's ``repartition(keys=...)`` hash
shuffle was tried first; its per-partition aggregator actors
oversubscribe small CPU counts, so the portable pattern above is used
instead.)
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import splitmix64

KHASH_COL = "__khash"


def exchange_coalesce_hint(est_rows: int) -> int | None:
    """Planner: explicit exchange partition count for SMALL inputs.

    The sort exchange's fixed cost is proportional to partition count
    (one map + one reduce task each, ~10-20 ms scheduling apiece —
    the same Dataset-fixed-cost-∝-block-count lesson as the round-4
    knn cache fix), and partition count follows the UPSTREAM block
    count, which for a small input can be two orders of magnitude past
    useful (measured: a 1M-row text-index build arrived in 128 dust
    blocks; coalescing the exchange input to 8 cut the build 8.8 s →
    3.8 s, identical output).  Given a cheap row-count estimate, this
    returns a partition count sized to the DATA
    (``OSIRAY_EXCHANGE_ROWS_PER_PART``, default 150k rows/partition)
    — or None above ``OSIRAY_EXCHANGE_COALESCE_MAX`` partitions
    (default 64), where upstream-block partitioning is already
    well-shaped and an extra repartition pass would only add cost.
    At the 10^12-doc design point every exchange input blows past the
    gate, so the at-scale plan is untouched by construction."""
    rows_per = int(os.environ.get("OSIRAY_EXCHANGE_ROWS_PER_PART", "150000"))
    max_parts = int(os.environ.get("OSIRAY_EXCHANGE_COALESCE_MAX", "64"))
    parts = max(4, -(-int(est_rows) // rows_per))
    return parts if parts <= max_parts else None


def _key_hash(batch: pa.Table, keys: list[str]) -> np.ndarray:
    """Deterministic uint64 hash across key columns (int or string).

    Strings go through C++ dictionary-encode first so crc32 runs once
    per DISTINCT value, not per row (a 20M-row batch with a 3k vocab
    does 3k Python hash calls, not 20M)."""
    import pyarrow.compute as pc

    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for k in keys:
        col = batch.column(k)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            d = pc.dictionary_encode(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
            dict_vals = d.dictionary.to_pylist()
            uniq_h = np.fromiter(
                (zlib.crc32(s.encode()) for s in dict_vals),
                dtype=np.uint64, count=len(dict_vals),
            )
            vals = uniq_h[d.indices.to_numpy(zero_copy_only=False)]
        else:
            vals = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        h = splitmix64(h ^ vals)
    return h


def _with_khash(ds: ray.data.Dataset, keys: list[str]) -> ray.data.Dataset:
    def add(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(KHASH_COL, pa.array([], pa.int64()))
        h = _key_hash(batch, keys).view(np.int64)
        return batch.append_column(KHASH_COL, pa.array(h))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def _partitioned_apply(ds: ray.data.Dataset, keys: list[str], num_partitions: int,
                       block_fn, out_schema: pa.Schema | None = None,
                       coalesce_to: int | None = None) -> ray.data.Dataset:
    """Key-complete exchange + vectorized per-partition apply (see module
    docstring).  ``num_partitions`` is kept for call-site compatibility;
    partitioning now follows the upstream block count — unless
    ``coalesce_to`` (from :func:`exchange_coalesce_hint`) pins an
    explicit partition count for a small input whose upstream blocks
    are fixed-cost dust.

    ``out_schema`` types the output for EMPTY range partitions: Ray's
    sort emits schema-less empty blocks when sampled boundaries repeat
    (hot keys guarantee duplicates at scale), and an untyped empty
    return would make the operator's bundle schemas inconsistent (the
    round-1 'RefBundle with a different schema' warning).

    Key-completeness GUARD (ADVICE r2 #1): the pattern assumes each
    sort-reduce partition arrives as exactly one never-split block.  If
    Ray's dynamic block splitting (or a future Ray) ever splits a
    partition mid-key, one key's rows straddle two batches and the
    per-block aggregate silently emits duplicate partial rows.  The
    per-task closure cell below compares the last key hash of one batch
    with the first of the next (split blocks of one task output stay
    in one downstream bundle, so consecutive calls in a task see them
    in order) and RAISES instead of corrupting the output; rerun the
    stage with a larger ``DataContext.target_max_block_size`` or fall
    back to ``groupby(keys).map_groups`` if it ever fires.  The cell is
    keyed by Ray task id (fresh per task execution, so re-executed
    partitions can't trip on stale state); splits whose halves land in
    DIFFERENT tasks are structurally undetectable here — the guard is
    best-effort within a task."""
    if coalesce_to:
        ds = ds.repartition(coalesce_to)
    ds = _with_khash(ds, keys)

    def per_block(batch: pa.Table, _state={"tid": None, "last": None}) -> pa.Table:
        if batch.num_columns == 0:
            # empty range partition from duplicate sort-sample
            # boundaries (hot keys) — emit a TYPED empty block
            if out_schema is not None:
                return out_schema.empty_table()
            return batch
        if batch.num_rows:
            # the guard cell lives as long as the deserialized function
            # object, which Ray may reuse across task executions in one
            # worker (round-3 ADVICE: a re-executed partition could see
            # a stale last-khash and raise spuriously) — key it by task
            # id so every task execution starts clean.  Splits whose
            # halves land in DIFFERENT tasks are not detectable here;
            # the guarantee is best-effort within a task (see docstring).
            import ray as _ray

            tid = _ray.get_runtime_context().get_task_id()
            if tid != _state["tid"]:
                _state["tid"], _state["last"] = tid, None
            kh = batch.column(KHASH_COL)
            first = kh[0].as_py()
            if _state["last"] is not None and _state["last"] == first:
                raise RuntimeError(
                    "key-complete exchange violated: a sort partition was "
                    "split mid-key (same __khash on both sides of a block "
                    "boundary); results would contain duplicate partial "
                    "groups — raise DataContext.target_max_block_size or "
                    "use groupby().map_groups for this stage"
                )
            _state["last"] = kh[len(kh) - 1].as_py()
        return block_fn(batch.drop_columns([KHASH_COL]))

    return ds.sort(KHASH_COL).map_batches(
        per_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _schema(*fields: tuple) -> pa.Schema:
    """Tiny schema builder for the out_schema call sites."""
    return pa.schema(list(fields))


def _list_array_parts(col) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, values) of a (chunked) list column, combined."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return (
        arr.offsets.to_numpy(zero_copy_only=False),
        arr.values.to_numpy(zero_copy_only=False),
    )


def sorted_unique_lists_block(batch: pa.Table, keys: list[str], value_col: str,
                              out_col: str = "items", count_col: str | None = "n_items") -> pa.Table:
    """One partition → one row per key combo with a SORTED UNIQUE list
    of ``value_col``.  Fully vectorized (C++ group_by + one lexsort)."""
    if batch.num_rows == 0:
        fields = [(k, batch.schema.field(k).type) for k in keys]
        fields.append((out_col, pa.list_(batch.schema.field(value_col).type)))
        if count_col:
            fields.append((count_col, pa.int64()))
        return pa.table({n: pa.array([], t) for n, t in fields})
    g = batch.group_by(keys).aggregate([(value_col, "list")])
    offsets, values = _list_array_parts(g.column(f"{value_col}_list"))
    n_groups = len(g)
    counts = np.diff(offsets)
    gidx = np.repeat(np.arange(n_groups, dtype=np.int64), counts)
    order = np.lexsort((values, gidx))
    gs, vs = gidx[order], values[order]
    keep = np.ones(len(gs), dtype=bool)
    keep[1:] = (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])
    gs2, vs2 = gs[keep], vs[keep]
    new_counts = np.bincount(gs2, minlength=n_groups)
    new_offsets = np.zeros(n_groups + 1, dtype=np.int64)
    np.cumsum(new_counts, out=new_offsets[1:])
    if new_offsets[-1] < 2**31:
        out_list = pa.ListArray.from_arrays(
            pa.array(new_offsets.astype(np.int32), pa.int32()), pa.array(vs2)
        )
    else:  # >2B values in one partition: large_list offsets
        out_list = pa.LargeListArray.from_arrays(pa.array(new_offsets), pa.array(vs2))
    cols = {k: g.column(k) for k in keys}
    cols[out_col] = out_list
    if count_col:
        cols[count_col] = pa.array(new_counts, pa.int64())
    return pa.table(cols)


def grouped_sorted_unique_lists(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    num_partitions: int = 32,
    out_col: str = "items",
    count_col: str | None = "n_items",
    out_schema: pa.Schema | None = None,
    coalesce_to: int | None = None,
) -> ray.data.Dataset:
    """Hash-partition by keys, vectorized per-partition list collect."""
    return _partitioned_apply(
        ds, keys, num_partitions,
        lambda b: sorted_unique_lists_block(b, keys, value_col, out_col, count_col),
        out_schema=out_schema, coalesce_to=coalesce_to,
    )


def grouped_distinct(ds: ray.data.Dataset, keys: list[str],
                     num_partitions: int = 32,
                     out_schema: pa.Schema | None = None,
                     coalesce_to: int | None = None) -> ray.data.Dataset:
    """DISTINCT over key columns: per-batch C++ dedup (combiner), hash
    partition, per-partition final dedup.  No per-group Python."""
    ds = ds.map_batches(
        lambda b: b.group_by(keys).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return _partitioned_apply(
        ds, keys, num_partitions, lambda b: b.group_by(keys).aggregate([]),
        out_schema=out_schema, coalesce_to=coalesce_to,
    )


def grouped_count_distinct(
    ds: ray.data.Dataset, keys: list[str], value_col: str,
    out_col: str = "n", num_partitions: int = 32,
    out_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """count(DISTINCT value) per key combo, vectorized end-to-end.
    Partitioning on ``keys`` alone keeps each key's values together, so
    the distinct + count completes within one partition."""
    slim = ds.map_batches(
        lambda b: b.group_by(keys + [value_col]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def cnt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], batch.schema.field(k).type) for k in keys},
                 out_col: pa.array([], pa.int64())}
            )
        d = batch.group_by(keys + [value_col]).aggregate([])
        g = d.group_by(keys).aggregate([(value_col, "count")])
        return g.rename_columns(keys + [out_col])

    return _partitioned_apply(slim, keys, num_partitions, cnt,
                              out_schema=out_schema)


def keyed_inner_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    num_partitions: int = 0,
) -> ray.data.Dataset:
    """Reduce-side inner equi-join on ONE key column via the key-complete
    sort exchange — the engine's robust replacement for
    ``Dataset.join`` where an input may carry EMPTY blocks.

    ``num_partitions`` (0 = follow upstream blocks) REPARTITIONS the
    tagged union before the exchange.  Output block count otherwise
    equals left_blocks + right_blocks, which COMPOUNDS in iterative
    pipelines (a label-propagation loop that joins its own output
    grows ~3x blocks per round — millions of tiny blocks by round 10,
    a driver-metadata explosion measured at 28 GB RSS with all workers
    idle).  Any join inside a loop must pass a bound here.

    Ray 2.49's hash-shuffle ``Dataset.join`` crashes
    (``ArrowInvalid: No match ... FieldRef``) whenever a join input
    contains empty blocks — even TYPED empty ones — because a shuffle
    partition fed no shards finalizes a column-less table (reproduced;
    round-2 ``dedup_clusters`` red row).  Materialized unions/groupbys
    routinely produce such blocks, so every join downstream of an
    exchange needs this path.  Mechanics: tag each side, align both to
    the column superset (nulls for the other side's payloads), union,
    ONE key-complete exchange, then a per-partition C++ ``Table.join``
    of the two (always typed) sides.  Same shuffle volume as a hash
    join; no per-partition aggregator actors (which also deadlock at
    small CPU counts — see SCALE.md).
    """
    lcols = [f for f in left_schema if f.name != key]
    rcols = [f for f in right_schema if f.name != key]
    dup = {f.name for f in lcols} & {f.name for f in rcols}
    if dup:
        raise ValueError(f"payload column collision: {sorted(dup)}")
    key_type = left_schema.field(key).type
    union_schema = pa.schema(
        [(key, key_type)]
        + [(f.name, f.type) for f in lcols + rcols]
        + [("__side", pa.int8())]
    )
    out_schema = pa.schema(
        [(key, key_type)] + [(f.name, f.type) for f in lcols + rcols]
    )
    lnames = [f.name for f in lcols]
    rnames = [f.name for f in rcols]

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            if n == 0 or batch.num_columns == 0:
                return union_schema.empty_table()
            cols = {key: batch.column(key)}
            for fld in lcols + rcols:
                cols[fld.name] = (
                    batch.column(fld.name)
                    if fld.name in batch.schema.names
                    else pa.nulls(n, fld.type)
                )
            cols["__side"] = pa.array(np.full(n, side, np.int8))
            return pa.table(cols).cast(union_schema)

        return f

    tagged = left.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True))
    if num_partitions > 0:
        tagged = tagged.repartition(num_partitions)

    def join_block(batch: pa.Table) -> pa.Table:
        side = batch.column("__side").to_numpy(zero_copy_only=False)
        l_tbl = batch.filter(pa.array(side == 0)).select([key] + lnames)
        r_tbl = batch.filter(pa.array(side == 1)).select([key] + rnames)
        return l_tbl.join(r_tbl, keys=[key], join_type="inner").select(
            [key] + lnames + rnames
        )

    return _partitioned_apply(tagged, [key], 0, join_block, out_schema=out_schema)


def salted_sorted_unique_lists(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    num_partitions: int = 32,
    salt_buckets: int = 8,
    out_col: str = "items",
    count_col: str | None = "n_items",
) -> ray.data.Dataset:
    """Skew-safe variant of grouped_sorted_unique_lists: two-level
    aggregation with a SALT on the grouping key.

    Hot keys (dense urban pixels, stop-word terms — SURVEY.md §4) make a
    single partition arbitrarily fat.  Level 1 groups by
    (keys..., salt = splitmix64(value) % S): a hot key's rows split
    across S salted sub-groups, each collected independently (bounded
    task size).  Level 2 re-groups the S partial lists per key and
    merges them (vectorized list-concat + sort-unique).  Results are
    identical to the unsalted path for any input; tests assert it.
    """

    def add_salt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__salt", pa.array([], pa.int32()))
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        s = (splitmix64(v.view(np.uint64) ^ np.uint64(0x5A17)) % np.uint64(salt_buckets)).astype(np.int32)
        return batch.append_column("__salt", pa.array(s))

    salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
    partial = _partitioned_apply(
        salted, keys + ["__salt"], num_partitions,
        lambda b: sorted_unique_lists_block(b, keys + ["__salt"], value_col, out_col, None),
    )

    def merge_partials(batch: pa.Table) -> pa.Table:
        """Concat each key's salted partial lists, sort+unique once."""
        if batch.num_rows == 0:
            fields = {k: pa.array([], batch.schema.field(k).type) for k in keys}
            fields[out_col] = pa.array([], batch.schema.field(out_col).type)
            if count_col:
                fields[count_col] = pa.array([], pa.int64())
            return pa.table(fields)
        b = batch.drop_columns(["__salt"])
        # explode partial lists back to rows, then collect per key
        offs, vals = _list_array_parts(b.column(out_col))
        counts = np.diff(offs)
        flat = {k: b.column(k).take(pa.array(np.repeat(np.arange(b.num_rows), counts))) for k in keys}
        flat_tbl = pa.table({**flat, value_col: pa.array(vals)})
        return sorted_unique_lists_block(flat_tbl, keys, value_col, out_col, count_col)

    return _partitioned_apply(partial, keys, num_partitions, merge_partials)
