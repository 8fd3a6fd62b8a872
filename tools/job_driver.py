"""`ray job submit`-able pipeline driver (north rule: "launched via
ray job submit on fixed-size clusters").

On a real cluster:

    ray job submit --working-dir /root/repo -- \
        python tools/job_driver.py --sf-dir /data/sf --out /data/index \
        --grid h3 --level 8 --shards 256

In this sandbox it runs against the local Ray (same code path: the job
entrypoint just uses whatever cluster `ray.init` joins).  The job:

  1. builds the spatial assignments pipeline,
  2. writes them RESUMABLY (per-shard manifest + lineage —
     rerunning the same job after a failure skips finished shards),
  3. builds + persists the search index,
  4. prints one JSON status line (metrics per stage).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--grid", default="h3")
    p.add_argument("--level", type=int, default=8)
    p.add_argument("--multiplier", type=int, default=1)
    p.add_argument("--shards", type=int, default=64)
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` this connects to the submitting cluster;
        # standalone it starts a local one
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    from oscar_spatial_index_compare_ray.sources.synth import ensure_corpus
    from oscar_spatial_index_compare_ray.pipelines.build_index import build_assignments
    from oscar_spatial_index_compare_ray.pipelines.persist import save_index
    from oscar_spatial_index_compare_ray.state.lineage import write_resumable

    status: dict = {"job": "spatial-index-build", "sf_dir": args.sf_dir}

    t0 = time.perf_counter()
    corpus = ensure_corpus(args.sf_dir, args.multiplier)
    ds = build_assignments(corpus, grids=(args.grid,), level=args.level, with_tiles=True)
    summary = write_resumable(
        ds, f"{args.out}/assignments", num_shards=args.shards,
        key_col="doc_id",
        lineage={"input": corpus, "grid": args.grid, "level": args.level,
                 "pipeline": "build_assignments", "version": 1},
    )
    status["assignments"] = summary
    status["assignments_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    meta = save_index(args.sf_dir, f"{args.out}/index", grid=args.grid,
                      level=args.level, multiplier=args.multiplier)
    status["index"] = meta
    status["index_sec"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(status))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
