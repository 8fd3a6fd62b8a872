"""CLI — the engine's analogues of the reference's three apps:

  build   ≙ osi-compare-create (apps/mainc.cpp): corpus → persisted index
  query   ≙ osi-compare-query  (apps/mainq.cpp): run queries / benchmark
            against a persisted index, raw per-query CSV + summary stats
  stats   ≙ osi-compare stats  (apps/main.cpp:147, src/OscarSgIndex.cpp:
            210-237): per-pixel item/cell distributions

Usage:
  python -m oscar_spatial_index_compare_ray.cli build  --sf-dir D --out I [--grid h3 --level 8]
  python -m oscar_spatial_index_compare_ray.cli query  --index I -q "a + b" [-q ...]
  python -m oscar_spatial_index_compare_ray.cli query  --index I --query-file F --benchmark out.csv [--hcqr] [--diff]
  python -m oscar_spatial_index_compare_ray.cli stats  --index I

Owns its Ray session (guarded init), unlike the driver-owned
__ray_entry__ path.
"""

from __future__ import annotations

import argparse
import sys
import time


def _ensure_ray(num_cpus: int | None = None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_build(args) -> int:
    _ensure_ray(args.num_cpus)
    from .pipelines.persist import save_index

    t0 = time.perf_counter()
    meta = save_index(args.sf_dir, args.out, grid=args.grid, level=args.level,
                      multiplier=args.multiplier)
    # index-build wall time print, apps/mainc.cpp:152-157 analogue
    print(f"built index {meta} in {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    return 0


def _load(args):
    from .pipelines.persist import load_engine

    return load_engine(args.index)


def cmd_query(args) -> int:
    import numpy as np

    _ensure_ray(args.num_cpus)
    eng = _load(args)

    queries: list[str] = list(args.query or [])
    if args.query_file:
        with open(args.query_file) as f:  # apps/mainq.cpp:126-140 analogue
            queries += [ln.strip() for ln in f if ln.strip()]
    if not queries:
        print("no queries given (-q or --query-file)", file=sys.stderr)
        return 2

    from .pipelines.hcqr_index import hcqr_tree, open_hcqr_index

    hidx = open_hcqr_index(eng)

    def eval_hcqr_tree(q):
        """Result TREE (depth()/number_of_nodes() carry the reference's
        per-query compactness stats, apps/mainq.cpp:151-156)."""
        if hidx is not None:
            # file-backed static HCQR completer (apps/mainq.cpp:658-670)
            return hcqr_tree(eng, hidx, q)
        # build trees from flat CQRs (hcqr-from-sg completer, :640-656)
        from .query.hcqr import HCQR
        from .query.parser import SetOp, AllToFull, parse

        leaf_pixels = eng.populated_pixels()

        def go(node):
            if isinstance(node, SetOp):
                return go(node.left).apply(node.op, go(node.right))
            if isinstance(node, AllToFull):
                return go(node.child).all_to_full()
            return HCQR.from_cqr(eng.evaluate(node), eng.grid, eng.level, leaf_pixels)

        return go(parse(q))

    def eval_hcqr(q):
        return eval_hcqr_tree(q).items()

    if args.serve:
        # pooled serving path: N QueryServer actors, hash dispatch
        # (apps/mainq.cpp interactive session, actor-pool form)
        from .query.serve import QueryServerPool

        pool = QueryServerPool(args.index, n=args.serve)
        try:
            t0 = time.perf_counter()
            results = pool.query_many(queries)
            dt = time.perf_counter() - t0
            for i, (q, items) in enumerate(zip(queries, results)):
                print(f"[{i}] {q!r}: items={len(items)}")
            print(f"served {len(queries)} queries via {args.serve} actors "
                  f"in {dt * 1000:.0f}ms", file=sys.stderr)
        finally:
            pool.shutdown()
        return 0

    rows = []
    for i, q in enumerate(queries):
        if args.warmup:
            # untimed warm-up run (apps/mainq.cpp:206-214 analogue)
            eng.complete(q).flaten()
        t0 = time.perf_counter()
        cqr = eng.complete(q)
        cqr_us = (time.perf_counter() - t0) * 1e6
        t0 = time.perf_counter()
        items = cqr.flaten()
        flaten_us = (time.perf_counter() - t0) * 1e6
        # per-query print, apps/mainq.cpp:694-703 analogue
        print(f"[{i}] {q!r}: cells={cqr.cell_count()} items={len(items)} "
              f"cqr={cqr_us:.0f}us flaten={flaten_us:.0f}us")
        if args.verbose:
            print("   ", items[:50].tolist(), "..." if len(items) > 50 else "")
        if args.diff or args.hcqr:
            htree = eval_hcqr_tree(q)
            h_items = htree.items()
            if args.hcqr:
                # per-query tree-compactness report (depth() /
                # numberOfNodes(), apps/mainq.cpp:151-156 +
                # src/static-htm-index.cpp:358-368)
                print(f"    hcqr items={len(h_items)} depth={htree.depth()} "
                      f"nodes={htree.number_of_nodes()}")
            if args.diff:
                # pairwise sym-diff across ALL completer variants
                # (debugDiff analogue, apps/mainq.cpp:399-482): eager
                # CQR, lazy TreedCQR, tree-from-CQR HCQR, and (when the
                # artifact exists) file-backed static HCQR
                variants = {
                    "cqr": items.tolist(),
                    "treed": eng.complete_treed(q).flaten().tolist(),
                    "hcqr": h_items.tolist(),
                }
                if hidx is not None:
                    from .query.hcqr import HCQR
                    from .query.parser import SetOp, AllToFull, parse

                    leaf_pixels = eng.populated_pixels()

                    def go(node):
                        if isinstance(node, SetOp):
                            return go(node.left).apply(node.op, go(node.right))
                        if isinstance(node, AllToFull):
                            return go(node.child).all_to_full()
                        return HCQR.from_cqr(eng.evaluate(node), eng.grid,
                                             eng.level, leaf_pixels)

                    variants["hcqr_from_cqr"] = go(parse(q)).items().tolist()
                names = list(variants)
                for x in range(len(names)):
                    for y in range(x + 1, len(names)):
                        a, b = set(variants[names[x]]), set(variants[names[y]])
                        if a != b:
                            print(f"    DIFF {names[x]}-{names[y]}: "
                                  f"only_{names[x]}={len(a - b)} "
                                  f"only_{names[y]}={len(b - a)}")
                            return 1
        rows.append((i, cqr_us, flaten_us, cqr.cell_count(), len(items)))

    if args.benchmark:
        # raw-stats CSV, apps/mainq.cpp:183-189,247-255 analogue
        with open(args.benchmark, "w") as f:
            f.write("id;cqr_us;flaten_us;cellCount;itemCount\n")
            for r in rows:
                f.write(f"{r[0]};{r[1]:.1f};{r[2]:.1f};{r[3]};{r[4]}\n")
        import numpy as np

        for name, col in [("cqr_us", 1), ("flaten_us", 2)]:
            v = np.array([r[col] for r in rows])
            # distribution summary, apps/mainq.cpp:258-264 analogue
            print(f"{name}: min={v.min():.0f} mean={v.mean():.0f} max={v.max():.0f}")
    return 0


def cmd_stats(args) -> int:
    _ensure_ray(args.num_cpus)
    import numpy as np

    eng = _load(args)
    sizes = eng.backend.posting_sizes()
    cp = eng.backend.cells_per_pixel()
    if not len(cp):
        cp = np.array([0])
    areas = eng.grid.area_km2(eng.populated_pixels().view(np.uint64))
    # per-pixel item/cell/area distributions, src/OscarSgIndex.cpp:210-237
    # + cell/area stats report apps/mainq.cpp:378-397 analogues
    print(f"pixels={len(sizes)} items/pixel: min={sizes.min()} mean={sizes.mean():.2f} max={sizes.max()}")
    print(f"cells/pixel: min={cp.min()} mean={cp.mean():.2f} max={cp.max()}")
    print(f"pixel area km2: min={areas.min():.4f} mean={areas.mean():.4f} max={areas.max():.4f}")
    print(f"terms={len(eng.backend.vocab())}")
    # index size on disk per artifact (getSizeInBytes analogue,
    # src/static-htm-index.cpp:38-41)
    import os

    total = 0
    for name in sorted(os.listdir(args.index)):
        p = os.path.join(args.index, name)
        if os.path.isdir(p):
            sz = sum(os.path.getsize(os.path.join(p, f)) for f in os.listdir(p))
        else:
            sz = os.path.getsize(p)
        total += sz
        print(f"size {name}: {sz / 1024:.1f} KiB")
    print(f"size total: {total / 1024:.1f} KiB")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="oscar_spatial_index_compare_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--sf-dir", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--grid", default="h3")
    b.add_argument("--level", type=int, default=8)
    b.add_argument("--multiplier", type=int, default=1)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("-q", "--query", action="append")
    q.add_argument("--query-file")
    q.add_argument("--benchmark", help="write raw per-query CSV here")
    q.add_argument("--hcqr", action="store_true", help="also evaluate via HCQR trees")
    q.add_argument("--diff", action="store_true", help="fail if CQR and HCQR disagree")
    q.add_argument("--warmup", action="store_true",
                   help="untimed warm-up evaluation per query before timing")
    q.add_argument("--serve", type=int, metavar="N",
                   help="answer via a pool of N QueryServer actors")
    q.add_argument("-v", "--verbose", action="store_true")

    s = sub.add_parser("stats")
    s.add_argument("--index", required=True)

    args = p.parse_args(argv)
    return {"build": cmd_build, "query": cmd_query, "stats": cmd_stats}[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
