"""Grid encoder tests: golden vectors, hierarchy algebra, covers.

Mirrors the reference's per-grid semantics (src/HtmSpatialGrid.cpp,
src/H3SpatialGrid.cpp, src/S2GeomSpatialGrid.cpp) and the cross-grid
agreement bar of apps/main.cpp:193-205.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oscar_spatial_index_compare_ray.grids import get_grid, grid_names

LAT = np.array([48.7758, -33.8688, 0.0, 89.5, -89.5, 10.0])
LON = np.array([9.1829, 151.2093, 0.0, 1.0, -170.0, -74.0])


@pytest.fixture(params=grid_names())
def grid(request):
    return get_grid(request.param)


class TestGridAlgebra:
    def test_encode_total_and_deterministic(self, grid):
        a = grid.encode(LAT, LON, 8)
        b = grid.encode(LAT.copy(), LON.copy(), 8)
        assert (a == b).all()
        assert (grid.level(a) == 8).all()

    def test_parent_level_chain(self, grid):
        pid = grid.encode(LAT, LON, 8)
        for want in (7, 6, 5):
            pid = grid.parent(pid)
            assert (grid.level(pid) == want).all()

    def test_parent_steps(self, grid):
        pid = grid.encode(LAT, LON, 8)
        assert (grid.parent(grid.parent(pid)) == grid.parent(pid, steps=2)).all()

    def test_is_ancestor(self, grid):
        pid = grid.encode(LAT, LON, 8)
        anc = grid.parent(pid, steps=3)
        assert grid.is_ancestor(anc, pid).all()
        assert grid.is_ancestor(pid, pid).all()  # reflexive, matches bit-compare semantics
        # a different branch is not an ancestor
        other = grid.encode(LAT + 20.0, LON, 8)
        far = grid.parent(other, steps=3)
        same = far == anc
        assert (~grid.is_ancestor(far, pid) | same).all()

    def test_children_roundtrip(self, grid):
        p = int(grid.encode(np.array([48.7758]), np.array([9.1829]), 4)[0])
        ch = grid.children(p)
        assert len(ch) >= 4
        assert (grid.parent(ch) == np.uint64(p)).all()
        assert (grid.level(ch) == 5).all()

    def test_point_in_own_bbox(self, grid):
        pid = grid.encode(LAT, LON, 8)
        la0, la1, lo0, lo1 = grid.bbox(pid)
        assert ((LAT >= la0 - 1e-9) & (LAT <= la1 + 1e-9)).all()
        assert ((LON >= lo0 - 1e-9) & (LON <= lo1 + 1e-9)).all()

    def test_area_positive(self, grid):
        pid = grid.encode(LAT, LON, 8)
        assert (grid.area_km2(pid) > 0).all()

    def test_cover_bbox_contains_encoded_points(self, grid):
        cover = grid.cover_bbox(48.0, 49.5, 8.5, 10.0, level=6)
        inside_lat = np.array([48.2, 48.8, 49.4])
        inside_lon = np.array([8.7, 9.2, 9.9])
        pids = grid.encode(inside_lat, inside_lon, 6)
        assert np.isin(pids, cover).all()


class TestGoldenVectors:
    """Frozen golden encodes: catch accidental algorithm drift.  These pin
    the engine's own spec (SURVEY.md §7: semantics defined by our spec +
    golden vectors)."""

    def test_simple_golden(self):
        g = get_grid("simple")
        pid = g.encode(np.array([48.7758]), np.array([9.1829]), 8)
        # level 8: rows=256, cols=512; row=floor((48.7758+90)/0.703125)=197
        # col = floor((9.1829+180)/0.703125) = 269
        assert int(pid[0]) == (8 << 56) | (197 << 28) | 269

    def test_simple_sql_expr_matches(self):
        import duckdb

        g = get_grid("simple")
        lat = np.round(np.linspace(-89.9, 89.9, 101), 4)
        lon = np.round(np.linspace(-179.9, 179.9, 101), 4)
        pid = g.encode(lat, lon, 8).astype(np.int64)
        import pandas as pd

        con = duckdb.connect()
        con.register("pts", pd.DataFrame({"lat": lat, "lon": lon}))
        sql_pid = con.execute(
            f"SELECT {g.sql_expr('lat', 'lon', 8)} AS pid FROM pts"
        ).fetchnumpy()["pid"]
        assert (sql_pid == pid).all()

    def test_htm_roots(self):
        g = get_grid("htm")
        # north pole region → a northern root (12..15), south → southern (8..11)
        n = int(g.encode(np.array([89.0]), np.array([0.0]), 0)[0])
        s = int(g.encode(np.array([-89.0]), np.array([0.0]), 0)[0])
        assert 12 <= n <= 15 and 8 <= s <= 11

    def test_s2_faces(self):
        g = get_grid("s2")
        ids = g.encode(np.array([0.0, 0.0, 89.9, -89.9]), np.array([0.0, 90.0, 0.0, 0.0]), 0)
        faces = (ids >> np.uint64(61)).astype(int)
        assert list(faces) == [0, 1, 2, 5]

    def test_h3_res8_size_realistic(self):
        g = get_grid("h3")
        pid = g.encode(np.array([48.7758]), np.array([9.1829]), 8)
        area = float(g.area_km2(pid)[0])
        # real H3 res 8 hexes are ~0.74 km²; our spec lands the same ballpark
        assert 0.1 < area < 5.0


class TestCrossGrid:
    """Points that are distinct at a level in one grid need not be in
    another — but every grid must give each point exactly one pixel and
    identical *point multisets* per pixel back (flatten-equality is
    checked at the pipeline level, apps/main.cpp:193-205 analogue)."""

    def test_one_pixel_per_point_everywhere(self):
        rng = np.random.default_rng(3)
        lat = rng.uniform(-85, 85, 2000)
        lon = rng.uniform(-179, 179, 2000)
        for name in grid_names():
            g = get_grid(name)
            pid = g.encode(lat, lon, 8)
            assert len(pid) == 2000
            assert (g.level(pid) == 8).all()


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(min_value=-89.99, max_value=89.99),
    lon=st.floats(min_value=-179.99, max_value=179.99),
    level=st.integers(min_value=1, max_value=10),
)
def test_property_parent_contains_child_center(lat, lon, level):
    """For subdivision grids the child's center lies in the parent; for
    the hex grid parenting is by center containment by construction."""
    for name in ("simple", "htm", "s2"):
        g = get_grid(name)
        pid = g.encode(np.array([lat]), np.array([lon]), level)
        par = g.parent(pid)
        assert g.is_ancestor(par, pid).all()
        la0, la1, lo0, lo1 = g.bbox(par)
        assert la0[0] - 1e-6 <= lat <= la1[0] + 1e-6
