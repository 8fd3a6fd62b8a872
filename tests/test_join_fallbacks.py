"""Shuffle-fallback parity for the two planner-style broadcast joins.

VERDICT r4 #1: at the 100×-scale design point both planners take
their SHUFFLE branch (doc-pixels > 4M rows / vocab > 4M terms), but
every toy-scale test only ever exercised the broadcast branch — the
scale path was dead code in CI.  These tests force each pipeline down
its fallback via the env-overridable thresholds and assert the output
is identical to the broadcast plan.
"""

import pandas as pd
import pytest


def _canon_text_index(ds):
    return {
        (r["term"], r["pixel"]): (r["fm"], r["n"], tuple(r["items"]))
        for r in ds.take_all()
    }


def test_doc_pixel_join_shuffle_fallback_parity(ray_session, corpus, monkeypatch):
    """build_text_index output is byte-identical whether _join_doc_pixels
    picks the broadcast map-side attach or the Dataset.join fallback
    (text_index.py:561-567 — the branch that runs at 10^12 docs)."""
    from oscar_spatial_index_compare_ray.pipelines.build_index import (
        build_assignments,
    )
    from oscar_spatial_index_compare_ray.pipelines.text_index import (
        build_text_index,
    )

    a = build_assignments(corpus, grids=("simple",), level=8,
                          with_tiles=False).materialize()

    monkeypatch.delenv("OSIRAY_BROADCAST_DP_MAX_ROWS", raising=False)
    broadcast = _canon_text_index(build_text_index(corpus, a, "simple_cell"))

    monkeypatch.setenv("OSIRAY_BROADCAST_DP_MAX_ROWS", "0")
    shuffled = _canon_text_index(build_text_index(corpus, a, "simple_cell"))

    assert broadcast == shuffled
    assert len(broadcast) > 0


def _canon_tfidf(ds):
    df = ds.to_pandas()
    return (
        df.sort_values(["doc_id", "rank", "term"], kind="stable")
        .reset_index(drop=True)
    )


def test_tfidf_reduce_join_fallback_parity(ray_session, sf_dir, monkeypatch):
    """q_tfidf_top_terms output is identical whether df attaches via the
    vocab broadcast or the reduce-side keyed_inner_join fallback
    (traindata.py — the branch that runs at web-scale vocabularies)."""
    from oscar_spatial_index_compare_ray.pipelines.traindata import (
        q_tfidf_top_terms,
    )

    monkeypatch.delenv("OSIRAY_BROADCAST_DF_MAX_ROWS", raising=False)
    broadcast = _canon_tfidf(q_tfidf_top_terms(sf_dir))

    monkeypatch.setenv("OSIRAY_BROADCAST_DF_MAX_ROWS", "0")
    fallback = _canon_tfidf(q_tfidf_top_terms(sf_dir))

    assert len(broadcast) > 0
    pd.testing.assert_frame_equal(broadcast, fallback)
