"""Deterministic synthetic corpus: pages + regions/cells + tiles.

The reference consumes an OSM corpus (item store + GeoHierarchy polygon
partition, apps/main.cpp:111-121).  The graft's input is a Parquet table
of Common-Crawl-style web pages ``(url, warc_ts, html, text, lang)``
(BASELINE.json input_hint); the polygon side is a synthetic
GeoHierarchy: a perturbed quadrilateral mesh of *cells* grouped into
*regions* (the analogue of liboscar's cell partition reached through
``gh.cell(cellId).itemPtr()``, src/OscarSgIndex.cpp:99-100).

Everything here is a pure function of (documents table, multiplier,
GENERATOR_VERSION) — same inputs → byte-identical outputs, regardless of
process, ordering or parallelism.  No RNG objects: all randomness is
counter-based splitmix64 on stable ids.

Emitted tables (cached under /tmp/osiray_cache/<key>/):
  pages.parquet        url, warc_ts, html, text, lang, doc_id
  points.parquet       doc_id, point_idx, lat, lon   (golden expectation)
  regions.parquet      region_id, name, admin_level, polygon
  cells.parquet        cell_id, region_id, polygon
  region_edges.parquet cell_id, region_id, x1,y1,x2,y2  (SQL PIP oracle)
  tiles.parquet        tile_id, tile_value              (raster side)
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import splitmix64
from ..functions.text_extract import escape_text

GENERATOR_VERSION = 5
CACHE_ROOT = os.environ.get("OSIRAY_CACHE", "/tmp/osiray_cache")

# World window (Europe-ish) — all mesh cells live inside it.
LAT0, LAT1 = 30.0, 60.0
LON0, LON1 = -10.0, 30.0
MESH_ROWS, MESH_COLS = 8, 12          # 96 cells
REGION_BLOCK = (2, 3)                  # cells per region → 4x4 = 16 regions
SENTINEL_CELL = 0                      # point matches no polygon (src/OscarSgIndex.cpp:107-109)

# Raster tile grid over the same window (independent of the spatial grids).
TILE_ROWS, TILE_COLS = 24, 36

HOTSPOTS = [(48.7758, 9.1829), (52.5200, 13.4050), (41.9028, 12.4964)]
HOTSPOT_SIGMA = 0.8


def _u01(x: np.ndarray) -> np.ndarray:
    """uint64 hash → uniform double in [0, 1)."""
    return (splitmix64(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


# ---------------------------------------------------------------------------
# Mesh / regions
# ---------------------------------------------------------------------------

def _mesh_corners() -> tuple[np.ndarray, np.ndarray]:
    """Perturbed (MESH_ROWS+1, MESH_COLS+1) corner grids (lat, lon).

    Interior corners jittered deterministically; boundary corners exact so
    the mesh tiles the window precisely (cells tile regions without
    overlap, FIXTURES.md §2).
    """
    dlat = (LAT1 - LAT0) / MESH_ROWS
    dlon = (LON1 - LON0) / MESH_COLS
    ii, jj = np.meshgrid(
        np.arange(MESH_ROWS + 1), np.arange(MESH_COLS + 1), indexing="ij"
    )
    lat = LAT0 + ii * dlat
    lon = LON0 + jj * dlon
    key = (ii * 10_000 + jj).astype(np.uint64)
    jlat = (_u01(key ^ np.uint64(0xA11CE)) - 0.5) * 0.5 * dlat
    jlon = (_u01(key ^ np.uint64(0xB0B)) - 0.5) * 0.5 * dlon
    interior = (ii > 0) & (ii < MESH_ROWS) & (jj > 0) & (jj < MESH_COLS)
    lat = np.where(interior, lat + jlat, lat)
    lon = np.where(interior, lon + jlon, lon)
    # round so text round-trips and SQL sees identical doubles
    return np.round(lat, 6), np.round(lon, 6)


def cell_id_at(i: int, j: int) -> int:
    return i * MESH_COLS + j + 1  # 0 is the sentinel


def region_id_at(i: int, j: int) -> int:
    br, bc = REGION_BLOCK
    return (i // br) * (MESH_COLS // bc) + (j // bc) + 1


def build_mesh_tables() -> dict[str, pa.Table]:
    clat, clon = _mesh_corners()
    cell_ids, region_ids, polys, edges = [], [], [], []
    for i in range(MESH_ROWS):
        for j in range(MESH_COLS):
            ring = [
                (clat[i, j], clon[i, j]),
                (clat[i, j + 1], clon[i, j + 1]),
                (clat[i + 1, j + 1], clon[i + 1, j + 1]),
                (clat[i + 1, j], clon[i + 1, j]),
            ]
            cid, rid = cell_id_at(i, j), region_id_at(i, j)
            cell_ids.append(cid)
            region_ids.append(rid)
            polys.append([{"lat": a, "lon": o} for a, o in ring])
            for k in range(4):
                (y1, x1), (y2, x2) = ring[k], ring[(k + 1) % 4]
                edges.append((cid, rid, x1, y1, x2, y2))

    poly_type = pa.list_(pa.struct([("lat", pa.float64()), ("lon", pa.float64())]))
    cells = pa.table(
        {
            "cell_id": pa.array(cell_ids, pa.uint32()),
            "region_id": pa.array(region_ids, pa.uint32()),
            "polygon": pa.array(polys, poly_type),
        }
    )
    e = np.array(edges, dtype=object)
    region_edges = pa.table(
        {
            "cell_id": pa.array([r[0] for r in edges], pa.uint32()),
            "region_id": pa.array([r[1] for r in edges], pa.uint32()),
            "x1": pa.array([r[2] for r in edges], pa.float64()),
            "y1": pa.array([r[3] for r in edges], pa.float64()),
            "x2": pa.array([r[4] for r in edges], pa.float64()),
            "y2": pa.array([r[5] for r in edges], pa.float64()),
        }
    )
    del e

    # region outlines: perimeter of each block of cells (concave after jitter)
    br, bc = REGION_BLOCK
    rids, names, levels, rpolys = [], [], [], []
    for bi in range(MESH_ROWS // br):
        for bj in range(MESH_COLS // bc):
            rid = bi * (MESH_COLS // bc) + bj + 1
            i0, i1 = bi * br, bi * br + br
            j0, j1 = bj * bc, bj * bc + bc
            ring = []
            for j in range(j0, j1):
                ring.append((clat[i0, j], clon[i0, j]))
            for i in range(i0, i1):
                ring.append((clat[i, j1], clon[i, j1]))
            for j in range(j1, j0, -1):
                ring.append((clat[i1, j], clon[i1, j]))
            for i in range(i1, i0, -1):
                ring.append((clat[i, j0], clon[i, j0]))
            rids.append(rid)
            names.append(f"region_{rid:03d}")
            levels.append(4 if rid % 3 else 6)
            rpolys.append([{"lat": a, "lon": o} for a, o in ring])
    # two overlapping overlay regions (no cells; exercises overlap fixtures)
    for n, (cy, cx, r) in enumerate([(49.0, 9.5, 3.0), (50.0, 11.0, 3.5)]):
        rid = 1000 + n
        ang = np.linspace(0.0, 2 * np.pi, 13)[:-1]
        rids.append(rid)
        names.append(f"overlay_{n}")
        levels.append(None)
        rpolys.append(
            [
                {"lat": round(cy + r * np.sin(a), 6), "lon": round(cx + r * np.cos(a), 6)}
                for a in ang
            ]
        )
    regions = pa.table(
        {
            "region_id": pa.array(rids, pa.uint32()),
            "name": pa.array(names, pa.string()),
            "admin_level": pa.array(levels, pa.int32()),
            "polygon": pa.array(rpolys, poly_type),
        }
    )
    return {"cells": cells, "regions": regions, "region_edges": region_edges}


def build_tiles_table() -> pa.Table:
    """Raster side of the raster-tile ↔ vector join: one value per tile."""
    tid = np.arange(TILE_ROWS * TILE_COLS, dtype=np.int64)
    val = np.round(_u01(tid.astype(np.uint64) ^ np.uint64(0x7117E)) * 100.0, 6)
    return pa.table({"tile_id": tid, "tile_value": val})


def tile_id_of(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Tile id for points; -1 outside the window.  SQL-mirrorable arithmetic."""
    r = np.floor((np.asarray(lat) - LAT0) / ((LAT1 - LAT0) / TILE_ROWS)).astype(np.int64)
    c = np.floor((np.asarray(lon) - LON0) / ((LON1 - LON0) / TILE_COLS)).astype(np.int64)
    ok = (r >= 0) & (r < TILE_ROWS) & (c >= 0) & (c < TILE_COLS)
    return np.where(ok, r * TILE_COLS + c, -1)


TILE_ID_SQL = (
    "CASE WHEN lat >= {lat0} AND lat < {lat1} AND lon >= {lon0} AND lon < {lon1} "
    "THEN CAST(floor((lat - {lat0}) / {dlat}) AS BIGINT) * {cols} "
    "+ CAST(floor((lon - {lon0}) / {dlon}) AS BIGINT) ELSE -1 END"
).format(
    lat0=LAT0, lat1=LAT1, lon0=LON0, lon1=LON1,
    dlat=(LAT1 - LAT0) / TILE_ROWS, dlon=(LON1 - LON0) / TILE_COLS, cols=TILE_COLS,
)


# ---------------------------------------------------------------------------
# Pages
# ---------------------------------------------------------------------------

def _gen_points(page_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized deterministic points for each page id.

    Returns (page_idx, lat, lon) — flattened (page, point) pairs in
    point-index order.  Counter-based: every value depends only on the
    page id and the point slot.
    """
    pid = page_ids.astype(np.uint64)
    n = (splitmix64(pid ^ np.uint64(0xC0)) % np.uint64(6)).astype(np.int64)  # 0..5
    max_k = 6
    cols_lat = np.zeros((len(pid), max_k))
    cols_lon = np.zeros((len(pid), max_k))
    for k in range(max_k):
        key = pid * np.uint64(max_k) + np.uint64(k)
        kind = _u01(key ^ np.uint64(0x11))
        u1 = _u01(key ^ np.uint64(0x22))
        u2 = _u01(key ^ np.uint64(0x33))
        u3 = np.maximum(_u01(key ^ np.uint64(0x44)), 1e-12)
        # hotspot gaussian via Box-Muller
        hidx = (splitmix64(key ^ np.uint64(0x55)) % np.uint64(len(HOTSPOTS))).astype(int)
        hlat = np.array([HOTSPOTS[i][0] for i in hidx])
        hlon = np.array([HOTSPOTS[i][1] for i in hidx])
        r = np.sqrt(-2.0 * np.log(u3)) * HOTSPOT_SIGMA
        g1 = r * np.cos(2 * np.pi * u2)
        g2 = r * np.sin(2 * np.pi * u2)
        lat_hot = np.clip(hlat + g1, LAT0 + 1e-3, LAT1 - 1e-3)
        lon_hot = np.clip(hlon + g2, LON0 + 1e-3, LON1 - 1e-3)
        lat_uni = LAT0 + u1 * (LAT1 - LAT0)
        lon_uni = LON0 + u2 * (LON1 - LON0)
        lat_out = -20.0 + u1 * 10.0          # south of the window → sentinel cell
        lon_out = 100.0 + u2 * 20.0
        lat = np.where(kind < 0.05, lat_out, np.where(kind < 0.65, lat_hot, lat_uni))
        lon = np.where(kind < 0.05, lon_out, np.where(kind < 0.65, lon_hot, lon_uni))
        cols_lat[:, k] = lat
        cols_lon[:, k] = lon
    # keep first n[k] slots per page
    mask = np.arange(max_k)[None, :] < n[:, None]
    page_idx, point_k = np.nonzero(mask)
    lat = np.round(cols_lat[page_idx, point_k], 4)
    lon = np.round(cols_lon[page_idx, point_k], 4)
    # round-trip through the text format so golden == parsed exactly
    lat = np.array([float(f"{v:.4f}") for v in lat])
    lon = np.array([float(f"{v:.4f}") for v in lon])
    return page_idx, lat, lon


def build_pages_tables(documents: pa.Table, multiplier: int = 1) -> dict[str, pa.Table]:
    """pages + golden points, derived from the driver's documents table.

    ``multiplier`` replicates each source document into several pages
    (distinct urls/ids/points) so bench corpora can be larger than the
    sf document count without external data.
    """
    docs = documents.sort_by("doc_id")
    src_ids = docs["doc_id"].to_numpy()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()

    n_src = len(src_ids)
    page_doc_id = np.empty(n_src * multiplier, dtype=np.int64)
    src_row = np.empty(n_src * multiplier, dtype=np.int64)
    copy_no = np.empty(n_src * multiplier, dtype=np.int64)
    for c in range(multiplier):
        page_doc_id[c * n_src: (c + 1) * n_src] = src_ids * multiplier + c
        src_row[c * n_src: (c + 1) * n_src] = np.arange(n_src)
        copy_no[c * n_src: (c + 1) * n_src] = c
    order = np.argsort(page_doc_id, kind="stable")
    page_doc_id, src_row, copy_no = page_doc_id[order], src_row[order], copy_no[order]

    pidx, plat, plon = _gen_points(page_doc_id)

    # assemble text with geotag sentences appended in point order
    geo_strs: list[list[str]] = [[] for _ in range(len(page_doc_id))]
    for row, la, lo in zip(pidx, plat, plon):
        k = len(geo_strs[row])
        if k % 2 == 0:
            geo_strs[row].append(f" geo:{la:.4f},{lo:.4f}")
        else:
            geo_strs[row].append(f" (lat {la:.4f}, lon {lo:.4f})")

    urls, tss, htmls, out_texts, out_langs = [], [], [], [], []
    base_ts = np.datetime64("2024-01-01T00:00:00", "us")
    for i, pdid in enumerate(page_doc_id):
        lang = langs[src_row[i]] or "en"
        text = texts[src_row[i]] + "".join(geo_strs[i])
        url = f"https://{lang}.example.org/doc/{src_ids[src_row[i]]}/{copy_no[i]}"
        html = (
            b"<html><head><title>doc</title><script>var x=1;</script>"
            b'<style>p{color:red}</style></head><body><nav>site nav</nav><main>'
            + escape_text(text)
            + b"</main><footer>&copy; example.org</footer></body></html>"
        )
        urls.append(url)
        tss.append(base_ts + np.timedelta64(int(pdid) * 1_000_000, "us"))
        htmls.append(html)
        out_texts.append(text)
        out_langs.append(lang)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
            "doc_id": pa.array(page_doc_id, pa.int64()),
        }
    )
    points = pa.table(
        {
            "doc_id": pa.array(page_doc_id[pidx], pa.int64()),
            "point_idx": pa.array(
                np.concatenate([np.arange(len(g)) for g in geo_strs if g])
                if len(pidx) else np.empty(0, np.int64),
                pa.int64(),
            ),
            "lat": pa.array(plat, pa.float64()),
            "lon": pa.array(plon, pa.float64()),
        }
    )
    return {"pages": pages, "points": points}


# ---------------------------------------------------------------------------
# Cache
# ---------------------------------------------------------------------------

def cache_key(sf_dir: str, multiplier: int = 1) -> str:
    return f"{Path(sf_dir).name}_x{multiplier}_v{GENERATOR_VERSION}"


def corpus_dir(sf_dir: str, multiplier: int = 1) -> str:
    return os.path.join(CACHE_ROOT, cache_key(sf_dir, multiplier))


def ensure_corpus(sf_dir: str, multiplier: int = 1) -> str:
    """Generate (once) and return the synthetic corpus dir for sf_dir."""
    out = Path(corpus_dir(sf_dir, multiplier))
    manifest = out / "MANIFEST.json"
    if manifest.exists():
        return str(out)
    tmp = Path(str(out) + ".tmp")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    tmp.mkdir(parents=True, exist_ok=True)
    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    tables = build_pages_tables(documents, multiplier)
    tables.update(build_mesh_tables())
    tables["tiles"] = build_tiles_table()
    for name, t in tables.items():
        if name == "pages" and t.num_rows > 16384:
            # pages is the BIG input: write a DIRECTORY of part files so
            # Ray's parquet reader parallelizes across files (a single
            # file reads in ONE task regardless of row groups) — and so
            # the layout matches the never-one-giant-file rule
            d = tmp / "pages.parquet"
            d.mkdir()
            per = 16384
            for i in range(0, t.num_rows, per):
                pq.write_table(
                    t.slice(i, per), d / f"part-{i // per:05d}.parquet",
                    row_group_size=8192,
                )
        else:
            # small row groups → parallel row-group scans for mid-size files
            pq.write_table(t, tmp / f"{name}.parquet", row_group_size=8192)
    (tmp / "MANIFEST.json").write_text(
        json.dumps(
            {
                "generator_version": GENERATOR_VERSION,
                "sf_dir": sf_dir,
                "multiplier": multiplier,
                "rows": {k: t.num_rows for k, t in tables.items()},
            }
        )
    )
    # atomic publish so concurrent callers never see a partial corpus
    try:
        tmp.rename(out)
    except OSError:
        pass  # another process won the race; its output is identical
    return str(out)
