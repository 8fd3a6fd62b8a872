"""Property-based CQR/TreedCQR algebra tests (hypothesis): the pixel-set
ops must implement exact per-pixel doc-set semantics — the engine's
equivalent of the reference's expensive-assert invariants
(SSERIALIZE_EXPENSIVE_ASSERT, SURVEY.md §5.2)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from oscar_spatial_index_compare_ray.query.cqr import CQR, TreedCQR
from oscar_spatial_index_compare_ray.pipelines.sinks import run_with_sink
from oscar_spatial_index_compare_ray.query.hierarchy import RegionHierarchy, default_cost

N_PIXELS = 6
DOCS_PER_PIXEL = 5

# global postings: pixel p holds docs [p*10, p*10 + DOCS_PER_PIXEL)
def _post(p: int) -> np.ndarray:
    return np.arange(p * 10, p * 10 + DOCS_PER_PIXEL, dtype=np.int64)


def _rows(docsets: dict[int, set[int]]):
    pix, fm, items = [], [], []
    for p, s in sorted(docsets.items()):
        if not s:
            continue
        full = s == set(_post(p).tolist())
        pix.append(p)
        fm.append(full)
        items.append(None if full else np.array(sorted(s), dtype=np.int64))
    return pix, fm, items


def _docsets_to_cqr(docsets: dict[int, set[int]]) -> CQR:
    return CQR.from_rows(*_rows(docsets), _post)


def _flatten(docsets: dict[int, set[int]]) -> list[int]:
    out = set()
    for s in docsets.values():
        out |= s
    return sorted(out)


docset_strategy = st.dictionaries(
    st.integers(min_value=0, max_value=N_PIXELS - 1),
    st.sets(st.integers(min_value=0, max_value=DOCS_PER_PIXEL - 1), max_size=DOCS_PER_PIXEL),
    max_size=N_PIXELS,
).map(lambda d: {p: {p * 10 + x for x in s} for p, s in d.items()})


@settings(max_examples=300, deadline=None)
@given(a=docset_strategy, b=docset_strategy)
def test_ops_match_set_semantics(a, b):
    ca, cb = _docsets_to_cqr(a), _docsets_to_cqr(b)
    keys = set(a) | set(b)
    ref = {
        "+": {p: a.get(p, set()) | b.get(p, set()) for p in keys},
        " ": {p: a.get(p, set()) & b.get(p, set()) for p in keys},
        "-": {p: a.get(p, set()) - b.get(p, set()) for p in keys},
        "^": {p: a.get(p, set()) ^ b.get(p, set()) for p in keys},
    }
    for op, expected in ref.items():
        got = ca.apply(op, cb).flaten().tolist()
        assert got == _flatten(expected), op
        # lazy variant agrees (TreedCQR == CQR after materialize,
        # static-htm-index.cpp:210-219)
        lazy = TreedCQR.from_cqr(ca).apply(op, TreedCQR.from_cqr(cb)).flaten().tolist()
        assert lazy == got, op


class _BulkPost:
    """Callable postings exposing the backend's bulk contract
    (`many` / `many_counts`, input sorted ascending) so the hypothesis
    suite drives the flat set-op kernel's BULK full-match expansion —
    the path every served query takes via engine._PostingsLookup —
    not just the scalar per-pixel fallback."""

    def __call__(self, pixel: int) -> np.ndarray:
        return _post(int(pixel))

    def many(self, pixels: np.ndarray) -> np.ndarray:
        pixels = np.asarray(pixels, np.int64)
        return (
            np.concatenate([_post(int(p)) for p in pixels])
            if len(pixels) else np.empty(0, np.int64)
        )

    def many_counts(self, pixels: np.ndarray):
        pixels = np.asarray(pixels, np.int64)
        assert np.all(np.diff(pixels) >= 0), "bulk contract: sorted input"
        return self.many(pixels), np.full(len(pixels), DOCS_PER_PIXEL, np.int64)


@settings(max_examples=300, deadline=None)
@given(a=docset_strategy, b=docset_strategy)
def test_ops_match_set_semantics_bulk_postings(a, b):
    bulk = _BulkPost()
    ca = CQR.from_rows(*_rows(a), bulk)
    cb = CQR.from_rows(*_rows(b), bulk)
    keys = set(a) | set(b)
    ref = {
        "+": {p: a.get(p, set()) | b.get(p, set()) for p in keys},
        " ": {p: a.get(p, set()) & b.get(p, set()) for p in keys},
        "-": {p: a.get(p, set()) - b.get(p, set()) for p in keys},
        "^": {p: a.get(p, set()) ^ b.get(p, set()) for p in keys},
    }
    for op, expected in ref.items():
        assert ca.apply(op, cb).flaten().tolist() == _flatten(expected), op


@settings(max_examples=100, deadline=None)
@given(a=docset_strategy)
def test_all_to_full_and_flatten(a):
    ca = _docsets_to_cqr(a)
    full = ca.all_to_full()
    expect = sorted({d for p in a if a[p] for d in _post(p).tolist()})
    assert full.flaten().tolist() == expect
    assert TreedCQR.from_cqr(ca).all_to_full().flaten().tolist() == expect


@settings(max_examples=50, deadline=None)
@given(a=docset_strategy, b=docset_strategy, c=docset_strategy)
def test_algebraic_identities(a, b, c):
    ca, cb, cc = (_docsets_to_cqr(x) for x in (a, b, c))
    # (A + B) - C == (A - C) + (B - C)
    lhs = ca.union(cb).difference(cc).flaten().tolist()
    rhs = ca.difference(cc).union(cb.difference(cc)).flaten().tolist()
    assert lhs == rhs
    # A ^ B == (A - B) + (B - A)
    assert ca.sym_diff(cb).flaten().tolist() == ca.difference(cb).union(cb.difference(ca)).flaten().tolist()


class TestSinks:
    def test_all_three_sinks(self, ray_session, corpus, tmp_path):
        import ray.data

        ds = ray.data.read_parquet(f"{corpus}/points.parquet")
        n = ds.count()
        assert run_with_sink(ds, "noop") == n
        mat = run_with_sink(ds, "memory")
        assert mat.count() == n
        summary = run_with_sink(ds, "parquet", out_dir=str(tmp_path / "o"), num_shards=4)
        assert summary["rows_written"] == n

    def test_unknown_sink(self, ray_session, corpus):
        import pytest
        import ray.data

        ds = ray.data.read_parquet(f"{corpus}/points.parquet")
        with pytest.raises(ValueError):
            run_with_sink(ds, "bogus")


class TestRegionHierarchy:
    def test_cost_fn_plans_and_equality(self, ray_session, sf_dir, corpus):
        import pyarrow.parquet as pq

        from oscar_spatial_index_compare_ray.pipelines.search import build_query_engine

        eng = build_query_engine(sf_dir, grid="h3", level=6)
        cells = pq.read_table(f"{corpus}/cells.parquet")
        regions = pq.read_table(f"{corpus}/regions.parquet")
        h_default = RegionHierarchy(cells, regions, default_cost)
        # admin regions (admin_level set) are cheap → direct; a cost fn
        # that forbids direct always decomposes
        h_cells = RegionHierarchy(cells, regions, lambda r, al, n: 1e9)
        assert h_cells.plan(1) == "cells"
        assert h_default.plan(1) == "direct"
        for rid in (1, 2, 7):
            a = h_default.region_docs(eng, rid).tolist()
            b = h_cells.region_docs(eng, rid).tolist()
            assert a == b  # both paths identical results
            # and both equal the engine's own region leaf
            name = h_default.name_of[rid]
            assert a == eng.complete(f"$region:{name}").flaten().tolist()
