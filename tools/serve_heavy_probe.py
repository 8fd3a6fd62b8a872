"""Serve-path capacity probe: heavy queries on the 200k-page index
(VERDICT r4 #7).

The round-2 record (~1.1 s/query on heavy 130k-doc-result queries,
BASELINE.md) predates the delta-bitpack encodings and the broadcast
doc-pixel join; this re-measures the same battery shape on the current
engine so BASELINE.md carries a current number.

Battery construction: the highest-document-frequency terms are read
from the persisted ``text_index`` (sum of per-(term,pixel) item counts
— the terms whose CQRs are corpus-sized), combined with the full set-op
family `+ / - ^` plus a 3-term nested expression, i.e. the worst-case
result sizes the engine can produce on this corpus.

Usage: python tools/serve_heavy_probe.py [--mult 40] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow.dataset as pads


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=40)  # 40 → 200k pages
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--idx", default="/tmp/osiray_heavy/index")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    from oscar_spatial_index_compare_ray.pipelines.persist import (
        load_engine,
        save_index,
    )

    marker = os.path.join(args.idx, "INDEX_META.json")
    if not os.path.exists(marker):
        t0 = time.perf_counter()
        save_index("/root/testdata/sf0.1", args.idx, grid="h3", level=8,
                   multiplier=args.mult)
        print(f"# index built in {time.perf_counter()-t0:.1f}s", flush=True)

    eng = load_engine(args.idx)

    # top-DF terms straight from the persisted text_index: DF(term) =
    # total items across its (term,pixel) rows in the full-match family
    ti = pads.dataset(os.path.join(args.idx, "text_index")).to_table(
        columns=["term", "n", "family"])
    fm = ti.filter(pads.field("family") == 0) if "family" in ti.column_names \
        else ti
    import pyarrow.compute as pc

    agg = fm.group_by("term").aggregate([("n", "sum")])
    order = pc.sort_indices(agg, sort_keys=[("n_sum", "descending")])
    top = agg.take(order.slice(0, 12))
    terms = [str(t) for t in top.column("term").to_pylist()]
    dfs = top.column("n_sum").to_pylist()
    print(f"# top-DF terms: {list(zip(terms, dfs))[:6]} ...", flush=True)

    a, b, c, d = terms[0], terms[1], terms[2], terms[3]
    battery = [
        a,                       # heaviest single term
        f"{a} + {b}",            # union of the two heaviest
        f"{a} / {b}",            # intersect
        f"{a} - {b}",            # difference
        f"{a} ^ {b}",            # symmetric difference
        f"({a} + {b}) - ({c} / {d})",   # nested, all heavy
        f"{a} ^ ({b} + {c})",
        f"{a[:3]}*",             # heavy prefix expansion
    ]

    eng.complete(battery[0]).flaten()  # warm row-group + vocab caches
    per_q: dict[str, dict] = {}
    for qq in battery:
        best, rows = float("inf"), 0
        for _ in range(args.reps):
            t0 = time.perf_counter()
            rows = len(eng.complete(qq).flaten())
            best = min(best, time.perf_counter() - t0)
        per_q[qq] = {"sec": round(best, 3), "docs": int(rows)}
        print(f"{qq!r}: {best:.3f}s -> {rows} docs", flush=True)

    total = sum(v["sec"] for v in per_q.values())
    out = {
        "index_pages": args.mult * 5000,
        "queries": per_q,
        "mean_sec_per_q": round(total / len(battery), 3),
        "max_docs": max(v["docs"] for v in per_q.values()),
    }
    print(json.dumps(out), flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
