"""Query-engine differential tests — the engine analogue of the
reference's oscar-vs-grid exact set comparison (apps/main.cpp:193-205)
and pairwise cross-engine debugDiff (apps/mainq.cpp:399-482).

Oracle: brute-force per-doc boolean evaluation over the synthetic
corpus (docs with >=1 geotag point, doc-level set algebra).  Every
query's flattened doc set must match exactly; and all four grids must
flatten to identical sets (the entire point of the reference)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from oscar_spatial_index_compare_ray.functions.tokenize import unique_terms
from oscar_spatial_index_compare_ray.stages.pip import PolygonIndex

LEVEL = 6  # coarse enough that pixels hold several docs → real fm/pm mix


@pytest.fixture(scope="module")
def engines(ray_session, sf_dir):
    from oscar_spatial_index_compare_ray.pipelines.search import build_query_engine

    return {g: build_query_engine(sf_dir, grid=g, level=LEVEL) for g in ("h3", "simple")}


@pytest.fixture(scope="module")
def brute(corpus):
    """Doc-level oracle: text terms + point geometry per doc."""
    pages = pq.read_table(f"{corpus}/pages.parquet", columns=["doc_id", "text"])
    points = pq.read_table(f"{corpus}/points.parquet")
    cells = pq.read_table(f"{corpus}/cells.parquet")

    terms_of = {}
    for did, text in zip(pages["doc_id"].to_pylist(), pages["text"].to_pylist()):
        terms_of[did] = set(unique_terms(text))
    pts_of = {}
    for r in points.to_pylist():
        pts_of.setdefault(r["doc_id"], []).append((r["lat"], r["lon"]))
    # cell of each point via the engine-independent polygon index
    pidx = PolygonIndex.from_arrow(cells, "cell_id")
    cell_of = {}
    for did, ps in pts_of.items():
        lat = np.array([p[0] for p in ps]); lon = np.array([p[1] for p in ps])
        cell_of[did] = set(pidx.assign_first(lat, lon).tolist())
    region_of_cell = dict(
        zip(cells["cell_id"].to_pylist(), cells["region_id"].to_pylist())
    )
    indexed = sorted(pts_of)  # docs with >= 1 point

    class Brute:
        def term(self, value, qt="exact"):
            def m(ts):
                if qt == "exact":
                    return value in ts
                if qt == "prefix":
                    return any(t.startswith(value) for t in ts)
                if qt == "suffix":
                    return any(t.endswith(value) for t in ts)
                return any(value in t for t in ts)

            return {d for d in indexed if m(terms_of[d])}

        def region(self, region_id):
            want = {c for c, r in region_of_cell.items() if r == region_id}
            return {d for d in indexed if cell_of[d] & want}

        def cell(self, cell_id):
            return {d for d in indexed if cell_id in cell_of[d]}

        def rect(self, la0, lo0, la1, lo1):
            return {
                d for d in indexed
                if any(la0 <= p[0] <= la1 and lo0 <= p[1] <= lo1 for p in pts_of[d])
            }

        def all_docs(self):
            return set(indexed)

    return Brute()


QUERIES = [
    # (query string, brute-force lambda name/args)
    ("table", lambda b: b.term("table")),
    ('"table"', lambda b: b.term("table")),
    ("tab*", lambda b: b.term("tab", "prefix")),
    ("*ble", lambda b: b.term("ble", "suffix")),
    ("*abl*", lambda b: b.term("abl", "substring")),
    ("table + window", lambda b: b.term("table") | b.term("window")),
    ("table window", lambda b: b.term("table") & b.term("window")),
    ("table / window", lambda b: b.term("table") & b.term("window")),
    ("table - window", lambda b: b.term("table") - b.term("window")),
    ("table ^ window", lambda b: b.term("table") ^ b.term("window")),
    ("(table + window) - merge", lambda b: (b.term("table") | b.term("window")) - b.term("merge")),
    ("table (window + merge)", lambda b: b.term("table") & (b.term("window") | b.term("merge"))),
    ("$region:region_001", lambda b: b.region(1)),
    ("$region:region_001 table", lambda b: b.region(1) & b.term("table")),
    ("$cell:5", lambda b: b.cell(5)),
    ("$cell:5 + $cell:6", lambda b: b.cell(5) | b.cell(6)),
    ("$rect:45.0,5.0,52.0,15.0", lambda b: b.rect(45.0, 5.0, 52.0, 15.0)),
    ("$rect:45.0,5.0,52.0,15.0 table", lambda b: b.rect(45.0, 5.0, 52.0, 15.0) & b.term("table")),
    ('"table scan"', lambda b: b.term("table") & b.term("scan")),
    ("nosuchterm12345", lambda b: set()),
    ("table - table", lambda b: set()),
    ("$full(table) - table", lambda b: set()),  # full-pixel promotion then subtract
]


@pytest.mark.parametrize("query,oracle", QUERIES, ids=[q for q, _ in QUERIES])
def test_query_matches_bruteforce(engines, brute, query, oracle):
    expected = sorted(oracle(brute))
    for gname, eng in engines.items():
        got = sorted(eng.complete(query).flaten().tolist())
        if "$full" in query:
            continue  # full promotion is pixel-granular; checked separately
        assert got == expected, f"grid={gname} query={query!r}"


def test_cross_grid_agreement(engines, brute):
    """All grids flatten every query to the same doc set
    (apps/main.cpp:193-205 analogue)."""
    for query, _ in QUERIES:
        if "$full" in query or "$point" in query:
            continue  # pixel-granular semantics are grid-dependent by design
        results = {
            g: tuple(eng.complete(query).flaten().tolist()) for g, eng in engines.items()
        }
        vals = set(results.values())
        assert len(vals) == 1, f"grids disagree on {query!r}: { {g: len(r) for g, r in results.items()} }"


def test_full_promotion_superset(engines, brute):
    """$full(X) flattens to every doc of every pixel X touches — a
    superset of X's docs (allToFull, static-htm-index.h:251-252)."""
    for gname, eng in engines.items():
        base = set(eng.complete("table").flaten().tolist())
        full = set(eng.complete("$full( table )").flaten().tolist())
        assert base <= full


def test_point_leaf_per_grid(engines, corpus):
    """$point:lat,lon returns the docs of the containing pixel —
    grid-dependent by design (cell-leaf analogue, HcqrOpTree.cpp:46-51)."""
    import pyarrow.parquet as pq
    from oscar_spatial_index_compare_ray.grids import get_grid

    points = pq.read_table(f"{corpus}/points.parquet")
    lat = points["lat"].to_numpy(); lon = points["lon"].to_numpy()
    doc = points["doc_id"].to_numpy()
    qlat, qlon = 48.7758, 9.1829
    for gname, eng in engines.items():
        g = get_grid(gname, default_level=LEVEL)
        qpix = g.encode(np.array([qlat]), np.array([qlon]), LEVEL)[0]
        allpix = g.encode(lat, lon, LEVEL)
        expected = sorted(set(doc[allpix == qpix].tolist()))
        got = sorted(eng.complete(f"$point:{qlat},{qlon}").flaten().tolist())
        assert got == expected, gname


def test_near_leaf(engines, corpus):
    """$near:lat,lon,k = docs owning the k nearest points."""
    points = pq.read_table(f"{corpus}/points.parquet")
    lat = points["lat"].to_numpy(); lon = points["lon"].to_numpy()
    doc = points["doc_id"].to_numpy()
    qlat, qlon = 48.7758, 9.1829
    from oscar_spatial_index_compare_ray.query.engine import _haversine_km

    d = _haversine_km(qlat, qlon, lat, lon)
    order = np.lexsort((np.arange(len(d)), doc, d))[:10]
    expected = sorted(set(doc[order].tolist()))
    for gname, eng in engines.items():
        got = sorted(eng.complete(f"$near:{qlat},{qlon},10").flaten().tolist())
        assert got == expected, gname


def test_qt_fallback(ray_session, sf_dir):
    """Index without substring support falls back substring→prefix→…→exact
    (src/static-htm-index.cpp:82-106)."""
    from oscar_spatial_index_compare_ray.pipelines.search import build_query_engine

    eng = build_query_engine(sf_dir, grid="simple", level=LEVEL,
                             supported_qts=("exact",))
    # '*abl*' requests substring; only exact supported → falls back to
    # exact lookup of 'abl' (which doesn't exist as a full token)
    assert eng.complete("*abl*").flaten().tolist() == eng.complete('"abl"').flaten().tolist()
    # exact queries still work
    assert len(eng.complete("table").flaten()) > 0


def test_empty_term_and_parse_errors(engines):
    from oscar_spatial_index_compare_ray.query.parser import ParseError, parse

    with pytest.raises(ParseError):
        parse("")
    with pytest.raises(ParseError):
        parse("(a + b")
    with pytest.raises(ParseError):
        parse("a +")
    eng = next(iter(engines.values()))
    assert eng.complete('""').flaten().tolist() == []  # empty string → empty result


def test_poly_leaf(engines, brute, corpus):
    """$poly: docs with a point inside an explicit polygon ring."""
    import pyarrow.parquet as pq

    from oscar_spatial_index_compare_ray.stages.pip import PolygonIndex

    ring = [(46.0, 6.0), (46.0, 14.0), (52.0, 14.0), (52.0, 6.0)]
    q = "$poly:" + ",".join(f"{a},{o}" for a, o in ring)
    points = pq.read_table(f"{corpus}/points.parquet")
    pidx = PolygonIndex(np.array([1]), [np.asarray(ring, dtype=np.float64)])
    inside = pidx.assign_first(points["lat"].to_numpy(), points["lon"].to_numpy()) == 1
    expected = sorted(set(points["doc_id"].to_numpy()[inside].tolist()))
    for gname, eng in engines.items():
        got = sorted(eng.complete(q).flaten().tolist())
        assert got == expected, gname


def test_complete_treed_matches_eager(engines):
    for gname, eng in engines.items():
        for q in ("table + window", "(table + window) - merge", "$full( tab* )"):
            eager = eng.complete(q).flaten().tolist()
            lazy = eng.complete_treed(q).flaten().tolist()
            assert eager == lazy, (gname, q)


def test_dilate_op(engines):
    """$dilate:KM(expr): adds every populated pixel whose bbox intersects
    the km-grown bboxes of matched pixels, as full-match (CELL_DILATION
    engine extension; reference throws, static-htm-index.h:253-267)."""
    for gname, eng in engines.items():
        base = eng.complete("table")
        dil = eng.complete("$dilate:30 ( table )")
        # superset of base, monotone in km
        assert set(base.flaten().tolist()) <= set(dil.flaten().tolist())
        bigger = eng.complete("$dilate:100 ( table )")
        assert set(dil.flaten().tolist()) <= set(bigger.flaten().tolist())
        # independent recomputation of the expected doc set
        la0, la1, lo0, lo1 = eng.grid.bbox(base.pixels.view(np.uint64))
        dlat = 30.0 / 111.195
        mid = np.clip(np.abs((la0 + la1) / 2.0), 0.0, 89.0)
        dlon = dlat / np.cos(np.radians(mid))
        pop = eng.populated_pixels()
        pl0, pl1, po0, po1 = eng.grid.bbox(pop.view(np.uint64))
        expected_docs = set(base.flaten().tolist())
        for k in range(len(la0)):
            m = (pl1 >= la0[k] - dlat) & (pl0 <= la1[k] + dlat) & \
                (po1 >= lo0[k] - dlon[k]) & (po0 <= lo1[k] + dlon[k])
            for p in pop[m]:
                expected_docs |= set(eng._post(int(p)).tolist())
        assert set(dil.flaten().tolist()) == expected_docs, gname
        assert dil.cell_count() >= base.cell_count()
        # zero dilation is identity
        same = eng.complete("$dilate:0 ( table )")
        assert same.flaten().tolist() == base.flaten().tolist()


def test_region_affix_match(engines, brute):
    """$region:region_00* — prefix match over region names unions the
    matching regions (STRING_REGION flavor)."""
    expected = set()
    for rid in range(1, 10):  # region_001..region_009
        expected |= brute.region(rid)
    for gname, eng in engines.items():
        got = set(eng.complete("$region:region_00*").flaten().tolist())
        assert got == expected, gname


class TestPayloadFamilies:
    """STRING/STRING_REGION/STRING_ITEM payload families
    (HcqrOpTree.cpp:24-45 leaf selection over the one-pass family build,
    src/OscarSearchSgIndex.cpp:471-488)."""

    def test_item_subset_of_mixed(self, engines):
        eng = engines["h3"]
        for t in ("table", "window", "region_001", "tab*"):
            mixed = set(eng.complete(t).flaten().tolist())
            item = set(eng.complete(f"$item:{t}").flaten().tolist())
            assert item <= mixed

    def test_mixed_is_item_union_region(self, engines):
        eng = engines["h3"]
        for t in ("table", "region_001", "region_002"):
            mixed = set(eng.complete(t).flaten().tolist())
            item = set(eng.complete(f"$item:{t}").flaten().tolist())
            region = set(eng.complete(f"$region:*{t}*").flaten().tolist())
            assert mixed == item | region

    def test_region_family_equals_region_leaf(self, engines, brute):
        """Region-family postings answer exactly like the cell-partition
        region leaf for a single-token region name."""
        eng = engines["h3"]
        fam = eng.complete("$region:*region_001*").flaten().tolist()
        leaf = eng.complete("$region:region_001").flaten().tolist()
        assert fam == leaf
        assert set(fam) == brute.region(1)

    def test_item_excludes_region_matches(self, engines, brute):
        """'region_001' matches docs VIA the region payload in mixed but
        not in the item family (no doc text contains it)."""
        eng = engines["h3"]
        mixed = set(eng.complete("region_001").flaten().tolist())
        item = set(eng.complete("$item:region_001").flaten().tolist())
        assert mixed == brute.region(1) | brute.term("region_001")
        assert item == brute.term("region_001")
