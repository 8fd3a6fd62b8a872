"""Per-stage task-seconds at two CPU levels — the hardware-vs-engine
attribution the scaling criterion needs (VERDICT round-1 #8).

Runs the identical headline job (spatial join + cell assignment, h3
res 8) in THIS process at the CPU count given by argv[1], prints one
JSON line with wall time and the per-operator totals parsed from
``ds.stats()``: if task-seconds for identical work inflate at the
higher level, the ceiling is hardware (SMT siblings / memory
bandwidth), not engine serialization.

Driven by ``python tools/scaling_evidence.py <num_cpus>`` — see
BASELINE.md for the recorded table.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    ncpu = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mult = int(os.environ.get("OSIRAY_BENCH_MULT", "200"))
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from oscar_spatial_index_compare_ray.sources.synth import ensure_corpus
    from oscar_spatial_index_compare_ray.pipelines.build_index import build_assignments

    corpus = ensure_corpus(os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"), mult)
    # warm-up pass (worker startup + page cache)
    build_assignments(corpus, grids=("h3",), level=8, with_tiles=False).count()

    t0 = time.perf_counter()
    ds = build_assignments(corpus, grids=("h3",), level=8, with_tiles=False).materialize()
    n = ds.count()
    wall = time.perf_counter() - t0

    stats = ds.stats()
    # per-operator remote wall-time totals: lines like
    #   "* Remote wall time: ... 12.3s total"
    ops: dict[str, float] = {}
    tasks: dict[str, int] = {}
    cur_op = None
    for line in stats.splitlines():
        m = re.match(r"Operator (\d+) (\S+): (\d+) tasks executed", line.strip())
        if m:
            cur_op = m.group(2)[:60]
            tasks[cur_op] = int(m.group(3))
        m = re.search(r"Remote wall time: .* ([\d.]+)(ms|s|us) total", line)
        if m and cur_op:
            v = float(m.group(1))
            unit = m.group(2)
            sec = v / 1000 if unit == "ms" else v / 1e6 if unit == "us" else v
            ops[cur_op] = ops.get(cur_op, 0.0) + sec
    print(json.dumps({
        "num_cpus": ncpu, "rows": int(n), "wall_sec": round(wall, 3),
        "task_seconds": {k: round(v, 2) for k, v in ops.items()},
        "tasks": tasks,
        "task_seconds_total": round(sum(ops.values()), 2),
        "mean_task_ms": {
            k: round(ops[k] / tasks[k] * 1000, 1)
            for k in ops if tasks.get(k)
        },
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
