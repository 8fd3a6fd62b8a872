"""Benchmark: headline spatial-join + cell-assignment throughput.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

--scaling: runs the headline job in TWO fresh processes
(num_cpus=8 then num_cpus=32) on the same input and reports both
throughputs + scaling efficiency (the sandbox evidence for the
north rule's N → 4N cluster criterion; see BASELINE.md).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32),
     OSIRAY_BENCH_MULT (pages multiplier, default 40 → ~200k pages at sf0.1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
MULT = int(os.environ.get("OSIRAY_BENCH_MULT", "40"))


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from oscar_spatial_index_compare_ray.sources.synth import ensure_corpus
    from oscar_spatial_index_compare_ray.pipelines.build_index import (
        build_assignments,
        build_trixel_data,
    )
    from oscar_spatial_index_compare_ray.pipelines import queries as q

    corpus = ensure_corpus(SF_DIR, MULT)

    import pyarrow.dataset as pads

    n_pages = pads.dataset(os.path.join(corpus, "pages.parquet")).count_rows()

    timings: dict[str, float] = {}

    # warm-up: one untimed pass (page cache + ray worker startup)
    build_assignments(corpus, grids=("h3",), level=8, with_tiles=False).count()

    # headline: full 4-grid spatial join + cell assignment, consumed to parquet
    t0 = time.perf_counter()
    ds = build_assignments(corpus, level=8)
    out = "/tmp/osiray_bench_out/assignments"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    ds.write_parquet(out)
    timings["assign_4grids_write"] = time.perf_counter() - t0

    # single-grid h3 join (the BASELINE.json metric config)
    t0 = time.perf_counter()
    n_points = build_assignments(corpus, grids=("h3",), level=8, with_tiles=False).count()
    timings["assign_h3"] = time.perf_counter() - t0

    # shuffle #1: trixel data groupby
    t0 = time.perf_counter()
    a = build_assignments(corpus, grids=("h3",), level=8, with_tiles=False)
    build_trixel_data(a, "h3_cell").count()
    timings["trixel_groupby"] = time.perf_counter() - t0

    # kNN query latency
    t0 = time.perf_counter()
    q._ASSIGN_CACHE.clear()
    q.assignments_for(SF_DIR)  # includes its own build; timed as index+query path
    q.q_knn(SF_DIR, k=25)
    timings["knn_with_build"] = time.perf_counter() - t0

    headline = timings["assign_h3"]
    result = {
        "metric": "spatial-join+cell-assignment sec (h3 res8, synthetic pages)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages": n_pages,
        "points": int(n_points),
        "docs_per_sec": round(n_pages / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency 8→32 cpus (spatial join h3 res8)",
                "sec_8": lo["value"],
                "sec_32": hi["value"],
                "docs_per_sec_8": lo["docs_per_sec"],
                "docs_per_sec_32": hi["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "pages": lo["pages"],
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
