"""Self-check: run every queries() entry and its oracle_sql() side by
side at a given sf, compare row count + sorted-column value hash —
a local mirror of the driver's CORRECTNESS gate.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype(np.int64)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    h = hashlib.md5(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()
    return len(df), list(df.columns), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    import ray

    if not ray.is_initialized():
        # default 8; set RAY_GRAFT_CPUS=32 to mirror the driver's session
        # (some Ray shuffle bugs only surface at high partition counts)
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import time

    failures = 0
    swept = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        swept += 1
        t0 = time.perf_counter()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}", flush=True)
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"OK?  {name}: rows={len(mine)} (no oracle; rows-only check) [{dt:.1f}s]", flush=True)
            continue
        try:
            ref = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        n1, c1, h1 = canon(mine)
        n2, c2, h2 = canon(ref)
        status = "OK  " if (n1, c1, h1) == (n2, c2, h2) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: rows {n1}/{n2} cols {'=' if c1 == c2 else f'{c1} vs {c2}'} hash {'=' if h1 == h2 else 'DIFFER'} [{dt:.1f}s+{time.perf_counter()-t0-dt:.1f}s]", flush=True)
        if status == "FAIL" and n1 == n2 and c1 == c2:
            # show first differing rows to debug
            a = mine[sorted(mine.columns)].sort_values(sorted(mine.columns)).reset_index(drop=True)
            b = ref[sorted(ref.columns)].sort_values(sorted(ref.columns)).reset_index(drop=True)
            for col in a.columns:
                x, y = a[col], b[col]
                if x.dtype != object and np.issubdtype(x.dtype, np.floating):
                    neq = ~np.isclose(x.fillna(-9e99), y.fillna(-9e99), atol=1e-6)
                else:
                    neq = x.astype(str).values != y.astype(str).values
                if neq.any():
                    i = int(np.nonzero(neq)[0][0])
                    print(f"   first diff col={col} row={i}: {x.iloc[i]!r} vs {y.iloc[i]!r}")
                    break
    expected = len(only & set(qs)) if only else len(qs)
    print(f"swept {swept}/{expected} queries ({len(qs)} registered), failures={failures}",
          flush=True)
    if swept != expected:
        print("FAIL sweep incomplete: a registered query was skipped", flush=True)
        failures += 1
    ray.shutdown()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
