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
