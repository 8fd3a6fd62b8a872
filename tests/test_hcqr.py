"""HCQR tree algebra vs flat CQR — flatten equality across all ops
(the cross-engine debugDiff invariant, apps/mainq.cpp:399-482)."""

import numpy as np
import pytest

from oscar_spatial_index_compare_ray.query.hcqr import HCQR

LEVEL = 6


@pytest.fixture(scope="module")
def eng(ray_session, sf_dir):
    from oscar_spatial_index_compare_ray.pipelines.search import build_query_engine

    return build_query_engine(sf_dir, grid="h3", level=LEVEL)


@pytest.fixture(scope="module")
def mk(eng):
    leaf_pixels = eng.populated_pixels()

    def make(query: str) -> HCQR:
        return HCQR.from_cqr(eng.complete(query), eng.grid, LEVEL, leaf_pixels)

    return make


PAIRS = [("table", "window"), ("tab*", "merge"), ("$region:region_001", "table")]


@pytest.mark.parametrize("qa,qb", PAIRS)
def test_hcqr_ops_match_cqr(eng, mk, qa, qb):
    a_c, b_c = eng.complete(qa), eng.complete(qb)
    a_h, b_h = mk(qa), mk(qb)
    for op in ("+", " ", "-"):
        flat_cqr = a_c.apply(op, b_c).flaten()
        flat_hcqr = a_h.apply(op, b_h).items()
        assert flat_cqr.tolist() == flat_hcqr.tolist(), op


def test_hcqr_symdiff_unsupported(mk):
    a, b = mk("table"), mk("window")
    with pytest.raises(NotImplementedError):
        a.apply("^", b)


def test_hcqr_roundtrip_flatten(eng, mk):
    for q in ("table", "tab*", "$cell:5"):
        assert mk(q).items().tolist() == eng.complete(q).flaten().tolist()


def test_compactify_preserves_flatten(eng, mk):
    h = mk("$full( a* )")  # full-match-rich tree → compaction has fuel
    c = h.compactified()
    assert c.items().tolist() == h.items().tolist()
    assert c.number_of_nodes() <= h.number_of_nodes()


def test_all_to_full_hcqr(eng, mk):
    h = mk("table")
    full = h.all_to_full()
    assert set(h.items().tolist()) <= set(full.items().tolist())


def test_depth_and_node_count(mk):
    h = mk("table")
    assert h.depth() == LEVEL + 1  # root-level hex .. leaf
    assert h.number_of_nodes() >= h.depth()


def test_hcqr_random_cqrs_match_flat(eng, mk):
    """Randomized CQR pairs (not just term queries): tree ops must agree
    with flat ops after flatten for every op."""
    import numpy as np

    from oscar_spatial_index_compare_ray.query.cqr import CQR
    from oscar_spatial_index_compare_ray.query.hcqr import HCQR

    rng = np.random.default_rng(11)
    leaf_pixels = eng.populated_pixels()

    def random_cqr():
        pick = rng.choice(leaf_pixels, size=40, replace=False)
        pix, fm, items = [], [], []
        for p in np.sort(pick):
            docs = eng._post(int(p))
            if rng.random() < 0.3 or len(docs) == 1:
                pix.append(int(p)); fm.append(True); items.append(None)
            else:
                take = rng.random(len(docs)) < 0.7
                if take.sum() == 0:
                    continue
                pix.append(int(p)); fm.append(False); items.append(docs[take])
        return CQR.from_rows(pix, fm, items, eng._post)

    for _ in range(10):
        a, b = random_cqr(), random_cqr()
        ha = HCQR.from_cqr(a, eng.grid, LEVEL, leaf_pixels)
        hb = HCQR.from_cqr(b, eng.grid, LEVEL, leaf_pixels)
        for op in ("+", " ", "-"):
            assert a.apply(op, b).flaten().tolist() == ha.apply(op, hb).items().tolist(), op


class TestPersistedHcqr:
    """File-backed HCQR payloads (apps/mainc.cpp:130-162 writer,
    apps/mainq.cpp:658-670 reader): flatten must agree with the flat-CQR
    engine on every query shape (debugDiff, apps/mainq.cpp:399-482)."""

    def test_agrees_with_cqr(self, eng):
        from oscar_spatial_index_compare_ray.pipelines.hcqr_index import (
            hcqr_complete,
            open_hcqr_index,
        )

        hidx = open_hcqr_index(eng)
        assert hidx is not None
        for q in (
            "table", "tab*", "table + window", "table - window",
            "table window", "(table + window) - merge",
            "$item:table", "$region:region_00*",
            "$full( table ) - window", "$cell:1 + table",
        ):
            a = hcqr_complete(eng, hidx, q).tolist()
            b = eng.complete(q).flaten().tolist()
            assert a == b, q

    def test_compaction_merges_nodes(self, eng):
        """The persisted rows contain fm nodes ABOVE leaf level (the
        compactified(0) upward merge did something) and every pm row
        sits exactly at leaf level."""
        import os

        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(eng.index_dir, "hcqr"),
                          columns=["level", "fm"])
        lv = t.column("level").to_numpy()
        fm = t.column("fm").to_numpy()
        assert (lv[~fm] == eng.level).all()
        assert (lv <= eng.level).all()

    def test_compact_level_bounds_merge(self, ray_session, sf_dir, tmp_path):
        """compact_level=L forbids merging above L: rebuild the artifact
        with compact_level == leaf_level (no merging possible) and check
        flatten is unchanged while no node rises above leaf level."""
        import os

        import pyarrow.parquet as pq
        import ray.data

        from oscar_spatial_index_compare_ray.pipelines.hcqr_index import (
            build_hcqr_index,
        )
        from oscar_spatial_index_compare_ray.pipelines.search import (
            build_query_engine, index_dir_for,
        )

        eng = build_query_engine(sf_dir, grid="h3", level=LEVEL)
        ti = ray.data.read_parquet(os.path.join(eng.index_dir, "text_index"))
        flat = build_hcqr_index(ti, eng.grid, LEVEL, compact_level=LEVEL)
        rows = flat.take_all()
        assert all(r["level"] == LEVEL for r in rows)
