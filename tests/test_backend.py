"""SortedParquetStore property tests: row-group-pruned range reads must
equal brute-force filters for any sorted table / row-group geometry."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from oscar_spatial_index_compare_ray.query.backend import SortedParquetStore


def _write(tmpdir, keys, row_group_size):
    t = pa.table({"k": pa.array(keys), "v": pa.array(np.arange(len(keys)))})
    path = str(tmpdir / "t.parquet")
    pq.write_table(t, path, row_group_size=row_group_size)
    return path


@settings(max_examples=40, deadline=None)
@given(
    keys=st.lists(st.integers(-50, 50), min_size=1, max_size=120),
    rgs=st.integers(1, 13),
    lo=st.integers(-60, 60),
    span=st.integers(0, 40),
)
def test_int_range_matches_brute(tmp_path_factory, keys, rgs, lo, span):
    tmp = tmp_path_factory.mktemp("store")
    keys = sorted(keys)
    store = SortedParquetStore(_write(tmp, keys, rgs), "k")
    hi = lo + span
    got = store.range(lo, hi)
    arr = np.array(keys)
    exp = arr[(arr >= lo) & (arr <= hi)]
    assert got.column("k").to_numpy(zero_copy_only=False).tolist() == exp.tolist()
    # point lookups
    for v in (keys[0], keys[-1], lo):
        p = store.point(v)
        assert p.num_rows == int((arr == v).sum())


@settings(max_examples=25, deadline=None)
@given(
    words=st.lists(st.text(alphabet="abcde", min_size=0, max_size=5),
                   min_size=1, max_size=60),
    rgs=st.integers(1, 7),
    q=st.text(alphabet="abcde", min_size=0, max_size=5),
)
def test_string_range_matches_brute(tmp_path_factory, words, rgs, q):
    tmp = tmp_path_factory.mktemp("store")
    words = sorted(words)
    store = SortedParquetStore(_write(tmp, words, rgs), "k")
    hi = q + chr(0x10FFFF)
    got = store.range(q, hi).column("k").to_pylist()
    exp = [w for w in words if q <= w <= hi]
    assert got == exp


def test_scan_batches_cover_all_rows(tmp_path):
    keys = sorted(np.random.default_rng(3).integers(0, 1000, 500).tolist())
    store = SortedParquetStore(_write(tmp_path, keys, 64), "k")
    n = sum(t.num_rows for t in store.scan_batches())
    assert n == len(keys)
    assert store.num_row_groups() == (len(keys) + 63) // 64


class TestTermRuns:
    def test_contiguous_terms_one_run(self):
        import numpy as np

        from oscar_spatial_index_compare_ray.query.backend import term_runs

        vocab = np.array(sorted("abcdefghij"), dtype=object)
        assert term_runs(["b", "c", "d"], vocab) == [("b", "d")]

    def test_scattered_terms_split(self):
        import numpy as np

        from oscar_spatial_index_compare_ray.query.backend import term_runs

        vocab = np.array([f"t{i:04d}" for i in range(1000)], dtype=object)
        runs = term_runs(["t0001", "t0002", "t0900"], vocab, max_gap=32)
        assert runs == [("t0001", "t0002"), ("t0900", "t0900")]

    def test_empty(self):
        import numpy as np

        from oscar_spatial_index_compare_ray.query.backend import term_runs

        assert term_runs([], np.empty(0, dtype=object)) == []
