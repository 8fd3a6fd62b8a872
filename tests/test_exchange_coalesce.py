"""Parity + planner tests for the size-gated exchange coalesce.

Round-5: `_partitioned_apply`'s exchange inherits its partition count
from the upstream block count, which for a SMALL input is fixed-cost
dust (measured: a 1M-row text-index build arrived in 128 blocks;
coalescing the exchange input to 8 cut the build 8.8 s → 3.8 s).
`exchange_coalesce_hint` sizes the exchange from a cheap row-count
estimate and turns itself OFF past 64 partitions, so the at-scale
plan (the 10^12-doc design point) is untouched by construction.
These tests pin (a) the hint's planner boundaries and (b) output
parity between the coalesced and inherited-partitioning plans on
every pipeline that takes the hint.
"""

import pytest


def test_hint_planner_boundaries(monkeypatch):
    from oscar_spatial_index_compare_ray.stages.groupagg import (
        exchange_coalesce_hint,
    )

    monkeypatch.delenv("OSIRAY_EXCHANGE_ROWS_PER_PART", raising=False)
    monkeypatch.delenv("OSIRAY_EXCHANGE_COALESCE_MAX", raising=False)

    # tiny input → floor of 4 partitions
    assert exchange_coalesce_hint(10) == 4
    # 1M rows @150k/part → 7 partitions
    assert exchange_coalesce_hint(1_000_000) == 7
    # past the 64-partition gate → None (at-scale plan untouched)
    assert exchange_coalesce_hint(64 * 150_000 + 1) is None
    assert exchange_coalesce_hint(10**12) is None
    # env overrides move both knobs
    monkeypatch.setenv("OSIRAY_EXCHANGE_ROWS_PER_PART", "100")
    monkeypatch.setenv("OSIRAY_EXCHANGE_COALESCE_MAX", "8")
    assert exchange_coalesce_hint(500) == 5
    assert exchange_coalesce_hint(10_000) is None


def _canon_text_index(ds):
    return {
        (r["term"], r["pixel"]): (r["fm"], r["n"], tuple(r["items"]))
        for r in ds.take_all()
    }


def test_text_index_coalesce_parity(ray_session, corpus):
    """build_text_index output is identical whether the exchanges are
    coalesced to an explicit partition count or inherit the upstream
    block count (the pre-round-5 plan)."""
    from oscar_spatial_index_compare_ray.pipelines.build_index import (
        build_assignments,
    )
    from oscar_spatial_index_compare_ray.pipelines.text_index import (
        build_text_index,
    )

    a = build_assignments(corpus, grids=("simple",), level=8,
                          with_tiles=False).materialize()

    inherited = _canon_text_index(
        build_text_index(corpus, a, "simple_cell", families=True))
    coalesced = _canon_text_index(
        build_text_index(corpus, a, "simple_cell", families=True,
                         exchange_coalesce=4))

    assert inherited == coalesced
    assert len(inherited) > 0


def test_postings_and_trixel_coalesce_parity(ray_session, corpus):
    from oscar_spatial_index_compare_ray.pipelines.build_index import (
        build_assignments,
        build_trixel_data,
    )
    from oscar_spatial_index_compare_ray.pipelines.text_index import (
        build_pixel_postings,
        doc_pixels,
    )

    a = build_assignments(corpus, grids=("h3",), level=8,
                          with_tiles=False).materialize()
    dp = doc_pixels(a, "h3_cell").materialize()

    def canon_postings(ds):
        return {r["pixel"]: (tuple(r["items"]), r["index_id"])
                for r in ds.take_all()}

    assert canon_postings(build_pixel_postings(dp, "h3_cell")) == \
        canon_postings(build_pixel_postings(dp, "h3_cell", coalesce_to=3))

    def canon_trixel(ds):
        return {(r["h3_cell"], r["cell_id"]): tuple(r["items"])
                for r in ds.take_all()}

    assert canon_trixel(build_trixel_data(a, "h3_cell")) == \
        canon_trixel(build_trixel_data(a, "h3_cell", coalesce_to=3))
