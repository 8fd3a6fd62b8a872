"""Two-scale probe of the round-4 operators (VERDICT r4 #4).

Builds scaled copies of the sf0.1 documents/events tables under /tmp
and times each round-4 operator at two multipliers, reporting wall
times and the growth ratio — the measured curve BASELINE.md cites.

Scaling construction (deterministic, no external data):
- documents ×M: copy c rewrites every token with an `_c{c}` suffix
  (underscore is a word character for the engine tokenizer, so each
  copy gets a disjoint vocabulary).  Near-dup structure is preserved
  WITHIN a copy and impossible ACROSS copies, so duplicate-pair count
  scales linearly with M — the realistic shape (corpus grows, dup rate
  constant).  A naive text replication would make pair enumeration
  quadratic in M and probe a different complexity class.
- events ×M: copy c shifts user_id/event_id by *M + c; per-user event
  counts (and thus per-partition work in the keyed joins) stay
  constant while total volume scales.

Usage: python tools/scale_probe.py [--mults 20 200] [--ops op1 op2 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT_ROOT = "/tmp/osiray_scale"

OPS = [
    "events_asof", "events_range_join", "contamination", "pii_scrub",
    "sample_stratified", "dedup_exact", "dedup_minhash", "dedup_simhash",
    "dedup_clusters",
]


def build_scaled(mult: int) -> str:
    out = os.path.join(OUT_ROOT, f"sf0.1x{mult}")
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    doc_id = docs.column("doc_id").to_numpy()
    text = docs.column("text")
    extra = {n: docs.column(n) for n in docs.column_names
             if n not in ("doc_id", "text")}
    w = pq.ParquetWriter(
        os.path.join(out, "documents.parquet"),
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())]
                  + [(n, extra[n].type) for n in extra]))
    for c in range(mult):
        # salt every token: word chars survive the split regex, so
        # "foo bar" -> "foo_q3 bar_q3" has a copy-disjoint vocabulary.
        # (no lookahead in RE2: capture the separator instead, then a
        # second anchored pass for the final token)
        t = pc.replace_substring_regex(
            text, pattern=r"(\w)(\W)", replacement=rf"\1_q{c}\2")
        t = pc.replace_substring_regex(
            t, pattern=r"(\w)$", replacement=rf"\1_q{c}")
        w.write_table(pa.table(
            {"doc_id": pa.array(doc_id * mult + c, pa.int64()), "text": t,
             **extra}))
    w.close()

    ev = pq.read_table(os.path.join(SRC, "events.parquet"))
    eid = ev.column("event_id").to_numpy()
    uid = ev.column("user_id").to_numpy()
    rest = {n: ev.column(n) for n in ev.column_names
            if n not in ("event_id", "user_id")}
    we = pq.ParquetWriter(
        os.path.join(out, "events.parquet"),
        pa.schema([("event_id", pa.int64()), ("user_id", pa.int64())]
                  + [(n, rest[n].type) for n in rest]))
    for c in range(mult):
        we.write_table(pa.table(
            {"event_id": pa.array(eid * mult + c, pa.int64()),
             "user_id": pa.array(uid * mult + c, pa.int64()),
             **rest}))
    we.close()

    # embeddings unused by the probed ops; link for path completeness
    shutil.copy(os.path.join(SRC, "embeddings.parquet"),
                os.path.join(out, "embeddings.parquet"))
    open(marker, "w").write("ok")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", nargs="+", type=int, default=[20, 200])
    ap.add_argument("--ops", nargs="+", default=OPS)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    from oscar_spatial_index_compare_ray.pipelines import traindata as td

    results: dict[str, dict] = {}
    for mult in args.mults:
        t0 = time.perf_counter()
        d = build_scaled(mult)
        print(f"# built x{mult} in {time.perf_counter()-t0:.1f}s -> {d}",
              flush=True)
        # warm pass: worker startup + page cache, so the first timed op
        # isn't charged for session setup
        ray.data.read_parquet(os.path.join(d, "documents.parquet")).count()
        ray.data.read_parquet(os.path.join(d, "events.parquet")).count()
        for op in args.ops:
            fn = getattr(td, f"q_{op}")
            t0 = time.perf_counter()
            res = fn(d)
            n = res.count() if hasattr(res, "count") and not isinstance(res, pa.Table) \
                else res.num_rows
            dt = time.perf_counter() - t0
            results.setdefault(op, {})[mult] = {"sec": round(dt, 2), "rows": int(n)}
            print(f"{op} x{mult}: {dt:.2f}s rows={n}", flush=True)

    if len(args.mults) == 2:
        a, b = args.mults
        print(f"\n| operator | x{a} sec | x{b} sec | wall ratio | "
              f"scale ratio {b//a}x |", flush=True)
        print("|---|---|---|---|---|", flush=True)
        for op, r in results.items():
            if a in r and b in r:
                ratio = r[b]["sec"] / max(r[a]["sec"], 1e-9)
                print(f"| {op} | {r[a]['sec']} | {r[b]['sec']} | "
                      f"{ratio:.1f}x | {b / a:.0f}x data |", flush=True)
    print(json.dumps(results), flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
