"""Vectorized grouped aggregation: equality with naive reference
computation, salt-invariance (skew handling), determinism across
partitioning."""

import numpy as np
import pyarrow as pa
import pytest


def _make_ds(n_rows=20_000, n_keys=50, hot_frac=0.4, seed=9):
    """Skewed (key, value) rows: one hot key holds ~40% of rows
    (the dense-urban-pixel fixture, FIXTURES.md §5)."""
    import ray.data

    rng = np.random.default_rng(seed)
    keys = rng.integers(1, n_keys, n_rows).astype(np.int64)
    hot = rng.random(n_rows) < hot_frac
    keys[hot] = 0
    vals = rng.integers(0, 500, n_rows).astype(np.int64)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    return ray.data.from_arrow(t).repartition(13), keys, vals


def _expected_lists(keys, vals):
    out = {}
    for k, v in zip(keys, vals):
        out.setdefault(int(k), set()).add(int(v))
    return {k: sorted(s) for k, s in out.items()}


@pytest.fixture(scope="module")
def skewed(ray_session):
    return _make_ds()


def _collect(ds):
    rows = ds.take_all()
    return {int(r["k"]): list(r["items"]) for r in rows}, rows


class TestGroupedLists:
    def test_matches_naive(self, skewed):
        from oscar_spatial_index_compare_ray.stages.groupagg import (
            grouped_sorted_unique_lists,
        )

        ds, keys, vals = skewed
        got, rows = _collect(grouped_sorted_unique_lists(ds, ["k"], "v"))
        assert got == _expected_lists(keys, vals)
        for r in rows:
            assert r["n_items"] == len(r["items"])

    def test_salted_identical_to_unsalted(self, skewed):
        from oscar_spatial_index_compare_ray.stages.groupagg import (
            grouped_sorted_unique_lists,
            salted_sorted_unique_lists,
        )

        ds, keys, vals = skewed
        a, _ = _collect(grouped_sorted_unique_lists(ds, ["k"], "v"))
        b, _ = _collect(salted_sorted_unique_lists(ds, ["k"], "v", salt_buckets=7))
        assert a == b

    def test_partitioning_invariance(self, skewed):
        """Same results at different partition counts (determinism under
        parallelism — SURVEY.md §7 hard part (e))."""
        from oscar_spatial_index_compare_ray.stages.groupagg import (
            grouped_sorted_unique_lists,
        )

        ds, keys, vals = skewed
        a, _ = _collect(grouped_sorted_unique_lists(ds, ["k"], "v", num_partitions=4))
        b, _ = _collect(grouped_sorted_unique_lists(ds, ["k"], "v", num_partitions=64))
        assert a == b


class TestDistinct:
    def test_grouped_distinct(self, skewed):
        from oscar_spatial_index_compare_ray.stages.groupagg import grouped_distinct

        ds, keys, vals = skewed
        rows = grouped_distinct(ds, ["k", "v"]).take_all()
        got = {(r["k"], r["v"]) for r in rows}
        assert got == set(zip(keys.tolist(), vals.tolist()))
        assert len(rows) == len(got)  # no duplicates across partitions

    def test_grouped_count_distinct(self, skewed):
        from oscar_spatial_index_compare_ray.stages.groupagg import (
            grouped_count_distinct,
        )

        ds, keys, vals = skewed
        rows = grouped_count_distinct(ds, ["k"], "v", out_col="n").take_all()
        expected = {k: len(v) for k, v in _expected_lists(keys, vals).items()}
        assert {int(r["k"]): int(r["n"]) for r in rows} == expected


def test_string_keys(ray_session):
    import ray.data

    from oscar_spatial_index_compare_ray.stages.groupagg import (
        grouped_sorted_unique_lists,
    )

    t = pa.table(
        {
            "term": pa.array(["a", "b", "a", "c", "b", "a"]),
            "doc": pa.array([3, 1, 1, 2, 1, 3], pa.int64()),
        }
    )
    rows = grouped_sorted_unique_lists(
        ray.data.from_arrow(t).repartition(3), ["term"], "doc"
    ).take_all()
    got = {r["term"]: list(r["items"]) for r in rows}
    assert got == {"a": [1, 3], "b": [1], "c": [2]}


def test_salted_classify_hot_term(ray_session):
    """Shuffle #2 salting (VERDICT #6): a stop-word-style hot term whose
    rows dwarf every partition must classify identically to the
    unsalted path — fm/pm per (term, pixel), empty items on fm rows."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from oscar_spatial_index_compare_ray.pipelines.text_index import (
        _BlockClassifier,
        _salted_classify,
    )
    from oscar_spatial_index_compare_ray.stages.groupagg import _partitioned_apply

    rng = np.random.default_rng(7)
    docs = np.arange(3000, dtype=np.int64)
    pixel_of_doc = (docs % 23).astype(np.int64)
    rows_doc, rows_term = [docs], ["the"] * len(docs)          # hot term: EVERY doc
    for t in ("alpha", "beta", "gamma"):
        sel = rng.choice(docs, size=400, replace=False)
        rows_doc.append(np.sort(sel))
        rows_term += [t] * 400
    doc_col = np.concatenate(rows_doc)
    pairs = pa.table(
        {
            "doc_id": pa.array(doc_col, pa.int64()),
            "term": pa.array(rows_term, pa.string()),
            "pixel": pa.array(pixel_of_doc[doc_col], pa.int64()),
        }
    )
    tot_pix, tot_n = np.unique(pixel_of_doc, return_counts=True)
    counts_ref = ray.put((tot_pix.astype(np.int64), tot_n.astype(np.int64)))
    ds = ray.data.from_arrow(pairs).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=512
    )

    def canon(rows):
        return {
            (r["term"], r["pixel"]): (r["fm"], r["n"], tuple(r["items"]))
            for r in rows
        }

    plain = canon(
        _partitioned_apply(ds, ["term"], 8, _BlockClassifier(counts_ref, "pixel")).take_all()
    )
    salted = canon(
        _salted_classify(ds, counts_ref, "pixel", 8, salt_buckets=4,
                         has_family=False).take_all()
    )
    assert plain == salted
    # the opt-in pixel-bounded level 2 is byte-identical too
    salted_px = canon(
        _salted_classify(ds, counts_ref, "pixel", 8, salt_buckets=4,
                         has_family=False, l2_pixel_bounded=True).take_all()
    )
    assert plain == salted_px
    # the hot term is full-match everywhere (every doc has it)
    assert all(plain[("the", int(p))][0] for p in tot_pix)


def test_hash_exchange_text_index_parity(ray_session, corpus):
    """The int64-hash wide-exchange variant of build_text_index produces
    the identical index (term strings re-attached from the vocab)."""
    from oscar_spatial_index_compare_ray.pipelines.build_index import (
        build_assignments,
    )
    from oscar_spatial_index_compare_ray.pipelines.text_index import (
        build_text_index,
    )

    a = build_assignments(corpus, grids=("simple",), level=8,
                          with_tiles=False).materialize()

    def canon(ds):
        return {
            (r["term"], r["pixel"]): (r["fm"], r["n"], tuple(r["items"]))
            for r in ds.take_all()
        }

    plain = canon(build_text_index(corpus, a, "simple_cell", salted=False))
    hashed = canon(build_text_index(corpus, a, "simple_cell",
                                    hash_exchange=True, salted=False))
    assert plain == hashed


class TestSchemaDriftFilter:
    """The package log filter must drop ONLY the empty-new-schema
    cosmetic warning, never real (typed) schema drift."""

    def test_predicate(self):
        import logging

        from oscar_spatial_index_compare_ray import _empty_schema_drift_filter

        def rec(msg):
            return logging.LogRecord("x", logging.WARNING, "f", 1, msg, (), None)

        noise = ("Operator produced a RefBundle with a different schema "
                 "than the previous one. Previous schema: a: int64, "
                 "new schema: . This may lead to unexpected behavior.")
        real = ("Operator produced a RefBundle with a different schema "
                "than the previous one. Previous schema: a: int64, "
                "new schema: b: int64. This may lead to unexpected behavior.")
        assert _empty_schema_drift_filter(rec(noise)) is False
        assert _empty_schema_drift_filter(rec(real)) is True
        assert _empty_schema_drift_filter(rec("unrelated warning")) is True
