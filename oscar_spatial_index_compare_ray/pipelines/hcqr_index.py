"""Persisted HCQR index: per-term compactified pixel-tree payloads.

Re-creation of the reference's static HCQR text index: the `hcqr`
create mode converts the sg index into a serialized per-string HCQR
tree payload (apps/mainc.cpp:130-162, creator
src/static-htm-index.cpp:250-449 — per strId convert each payload CQR
to an HCQRSpatialGrid tree :349-369, optional compactify :359-362,
serialize compact leaf nodes :310-347), and the query app opens
`dir/search.hcqr` directly (apps/mainq.cpp:658-670).

Engine layout: `out_dir/hcqr/` parquet rows, sorted by term —

    family: int8, term: string, pixel: int64, level: uint8,
    fm: bool, items: list<int64>

A node row is either FULL-MATCH at some level `compact_level <= l <=
leaf_level` (children merged upward while every child slot was
full-match — the compactified(level) semantics) or a PARTIAL leaf at
`leaf_level` carrying its item list.  The build runs as one Ray
pipeline over the text_index rows: hash-partition by term (all of a
term's rows co-locate), then a vectorized per-block upward merge.

The loader (`HcqrTextIndex`) serves per-term trees from the term-sorted
parquet via row-group pruning, mirroring the main index's
query-without-loading path.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

from ..grids.base import Grid
from ..query.hcqr import HCQR, HNode


def hcqr_node_rows_block(batch: pa.Table, grid: Grid, leaf_level: int,
                         compact_level: int = 0) -> pa.Table:
    """One term-complete block of text_index rows → HCQR node rows.

    Vectorized upward merge: per level, lexsort fm nodes by
    (term, family, parent) and merge groups that fill every child slot
    (src/static-htm-index.cpp:359-362 compactify)."""
    import pyarrow.compute as pc

    has_family = "family" in batch.column_names
    if batch.num_rows == 0:
        cols = {}
        if has_family:
            cols["family"] = pa.array([], pa.int8())
        cols.update({
            "term": pa.array([], pa.string()),
            "pixel": pa.array([], pa.int64()),
            "level": pa.array([], pa.uint8()),
            "fm": pa.array([], pa.bool_()),
            "items": pa.array([], pa.list_(pa.int64())),
        })
        return pa.table(cols)

    tcol = batch.column("term")
    d = pc.dictionary_encode(tcol.combine_chunks() if isinstance(tcol, pa.ChunkedArray) else tcol)
    term_dict = d.dictionary
    tcode = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    fam = (
        batch.column("family").to_numpy(zero_copy_only=False).astype(np.int64)
        if has_family else np.zeros(len(tcode), np.int64)
    )
    pix = batch.column("pixel").to_numpy(zero_copy_only=False).astype(np.int64)
    fm = batch.column("fm").to_numpy(zero_copy_only=False).astype(bool)
    items = batch.column("items")
    items = items.combine_chunks() if isinstance(items, pa.ChunkedArray) else items

    out_t, out_f, out_p, out_l, out_fm = [], [], [], [], []
    out_item_rows: list[int] = []  # source row index for pm items, -1 for fm

    # partial leaves pass through at leaf_level
    pm_idx = np.nonzero(~fm)[0]
    out_t.append(tcode[pm_idx])
    out_f.append(fam[pm_idx])
    out_p.append(pix[pm_idx])
    out_l.append(np.full(len(pm_idx), leaf_level, np.int64))
    out_fm.append(np.zeros(len(pm_idx), bool))
    out_item_rows.extend(pm_idx.tolist())

    # fm nodes: merge upward while a parent's every child slot is fm
    cur_t, cur_f, cur_p = tcode[fm], fam[fm], pix[fm]
    lvl = leaf_level
    while lvl > compact_level and len(cur_t):
        par = grid.parent(cur_p.view(np.uint64)).view(np.int64)
        order = np.lexsort((cur_p, par, cur_f, cur_t))
        ct, cf, cp, pp = cur_t[order], cur_f[order], cur_p[order], par[order]
        gstart = np.nonzero(
            np.r_[True, (ct[1:] != ct[:-1]) | (cf[1:] != cf[:-1]) | (pp[1:] != pp[:-1])]
        )[0]
        gcount = np.diff(np.r_[gstart, len(ct)])
        uniq_par = pp[gstart]
        # full-slot counts per unique parent (few parents; scalar API)
        u, inv = np.unique(uniq_par, return_inverse=True)
        slots = np.fromiter(
            (grid.children_count(int(p)) for p in u), dtype=np.int64, count=len(u)
        )[inv]
        merged = gcount == slots
        # rows in non-merged groups are FINAL nodes at this level
        row_merged = np.repeat(merged, gcount)
        keep_t, keep_f, keep_p = ct[~row_merged], cf[~row_merged], cp[~row_merged]
        out_t.append(keep_t)
        out_f.append(keep_f)
        out_p.append(keep_p)
        out_l.append(np.full(len(keep_t), lvl, np.int64))
        out_fm.append(np.ones(len(keep_t), bool))
        out_item_rows.extend([-1] * len(keep_t))
        # merged groups continue upward as parent fm nodes
        cur_t = ct[gstart][merged]
        cur_f = cf[gstart][merged]
        cur_p = uniq_par[merged]
        lvl -= 1
    if len(cur_t):
        out_t.append(cur_t)
        out_f.append(cur_f)
        out_p.append(cur_p)
        out_l.append(np.full(len(cur_t), lvl, np.int64))
        out_fm.append(np.ones(len(cur_t), bool))
        out_item_rows.extend([-1] * len(cur_t))

    t_all = np.concatenate(out_t)
    f_all = np.concatenate(out_f)
    p_all = np.concatenate(out_p)
    l_all = np.concatenate(out_l)
    fm_all = np.concatenate(out_fm)
    # item lists: take source rows for pm leaves, empty lists for fm —
    # variable-length gather (start-of-segment repeat + intra-segment
    # position arithmetic; no per-row Python)
    src = np.array(out_item_rows, dtype=np.int64)
    offs_src = items.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals_src = items.values.to_numpy(zero_copy_only=False)
    counts = np.where(src >= 0, offs_src[np.maximum(src, 0) + 1] - offs_src[np.maximum(src, 0)], 0)
    new_offs = np.zeros(len(src) + 1, dtype=np.int64)
    np.cumsum(counts, out=new_offs[1:])
    starts_rep = np.repeat(offs_src[np.maximum(src, 0)], counts)
    pos = np.arange(int(counts.sum())) - np.repeat(np.cumsum(counts) - counts, counts)
    new_vals = vals_src[starts_rep + pos]
    if new_offs[-1] < 2**31:
        out_items = pa.ListArray.from_arrays(
            pa.array(new_offs.astype(np.int32), pa.int32()), pa.array(new_vals)
        )
    else:
        out_items = pa.LargeListArray.from_arrays(pa.array(new_offs), pa.array(new_vals))

    cols = {}
    if has_family:
        cols["family"] = pa.array(f_all.astype(np.int8))
    cols.update({
        "term": term_dict.take(pa.array(t_all, pa.int64())),
        "pixel": pa.array(p_all, pa.int64()),
        "level": pa.array(l_all.astype(np.uint8), pa.uint8()),
        "fm": pa.array(fm_all, pa.bool_()),
        "items": out_items,
    })
    return pa.table(cols)


def build_hcqr_index(
    text_index: ray.data.Dataset,
    grid: Grid,
    leaf_level: int,
    compact_level: int = 0,
    num_partitions: int | None = None,
    coalesce_to: int | None = None,
) -> ray.data.Dataset:
    """text_index rows → HCQR node rows (one term-keyed exchange)."""
    import ray as _ray

    from ..stages.groupagg import _partitioned_apply

    if num_partitions is None:
        num_partitions = max(2, min(64, int(_ray.cluster_resources().get("CPU", 8))))
    cols = [c for c in ("family", "term", "pixel", "fm", "items")
            if c in text_index.schema().names]
    slim = text_index.select_columns(cols)
    fam_fields = [("family", pa.int8())] if "family" in cols else []
    return _partitioned_apply(
        slim, ["term"], num_partitions,
        lambda b: hcqr_node_rows_block(b, grid, leaf_level, compact_level),
        out_schema=pa.schema(fam_fields + [
            ("term", pa.string()), ("pixel", pa.int64()),
            ("level", pa.uint8()), ("fm", pa.bool_()),
            ("items", pa.list_(pa.int64())),
        ]),
        coalesce_to=coalesce_to,
    )


def save_hcqr_index(out_dir: str, grid: Grid, leaf_level: int,
                    compact_level: int = 0) -> None:
    """Append the hcqr/ artifact to a persisted index dir (reads the
    already-written text_index parquet; apps/mainc.cpp:130-162 mode)."""
    import shutil

    hdir = os.path.join(out_dir, "hcqr")
    shutil.rmtree(hdir, ignore_errors=True)
    tdir = os.path.join(out_dir, "text_index")
    ti = ray.data.read_parquet(tdir)
    # exact input row count is free from the just-written parquet
    # metadata — size the exchange instead of inheriting block dust
    import pyarrow.dataset as pads

    from ..stages.groupagg import exchange_coalesce_hint

    n_rows = pads.dataset(tdir).count_rows()
    nodes = build_hcqr_index(ti, grid, leaf_level, compact_level,
                             coalesce_to=exchange_coalesce_hint(n_rows))
    from .persist import ROW_GROUP_SIZE

    nodes.sort("term").write_parquet(hdir, row_group_size=ROW_GROUP_SIZE)


class HcqrTextIndex:
    """Reader for the persisted HCQR payloads: per-(term, family) trees
    served by term-range row-group pruning (apps/mainq.cpp:658-670 —
    `dir/search.hcqr` opened without loading)."""

    def __init__(self, out_dir: str, grid: Grid, leaf_level: int,
                 postings, leaf_pixels: np.ndarray,
                 vocab: np.ndarray | None = None):
        from ..query.backend import SortedParquetStore

        self._store = SortedParquetStore(os.path.join(out_dir, "hcqr"), "term")
        self.grid = grid
        self.leaf_level = leaf_level
        self.postings = postings
        self.leaf_pixels = np.asarray(leaf_pixels, dtype=np.int64)
        self.vocab = vocab if vocab is not None else np.empty(0, dtype=object)

    def tree(self, terms: list[str], family: int = 0) -> HCQR:
        """Union-of-terms HCQR for a term leaf (the per-string payload;
        multiple terms arise from prefix/affix expansion)."""
        import pyarrow.compute as pc

        from ..query.backend import term_runs

        h = HCQR(self.grid, self.leaf_level, self.postings, self.leaf_pixels)
        if not terms:
            return h
        terms = sorted(terms)
        vset = pa.array(terms, pa.string())
        # per-run pruned reads (see backend.term_rows): scattered
        # substring matches must not widen into one index-wide range
        vocab = self.vocab if len(self.vocab) else np.asarray(terms, dtype=object)
        parts = []
        for lo, hi in term_runs(terms, vocab):
            rt = self._store.range(lo, hi)
            if rt.num_rows:
                mask = pc.is_in(rt.column("term"), value_set=vset)
                if "family" in rt.column_names:
                    mask = pc.and_(mask, pc.equal(rt.column("family"), family))
                rt = rt.filter(mask)
            if rt.num_rows:
                parts.append(rt)
        if not parts:
            return h
        t = pa.concat_tables(parts).combine_chunks()
        items = t.column("items")
        items = items.combine_chunks() if isinstance(items, pa.ChunkedArray) else items
        offs = items.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = items.values.to_numpy(zero_copy_only=False).astype(np.int64)
        pix = t.column("pixel").to_numpy(zero_copy_only=False)
        lvl = t.column("level").to_numpy(zero_copy_only=False)
        fm = t.column("fm").to_numpy(zero_copy_only=False)
        for i in range(t.num_rows):
            self._insert(h, int(pix[i]), int(lvl[i]), bool(fm[i]),
                         None if fm[i] else vals[offs[i]: offs[i + 1]])
        return h

    def _insert(self, h: HCQR, pixel: int, level: int, fm: bool, items):
        # ancestor chain root..node at `level`
        chain = [pixel]
        cur = np.array([pixel], dtype=np.int64)
        for _ in range(level):
            cur = h.grid.parent(cur.view(np.uint64)).view(np.int64)
            chain.append(int(cur[0]))
        chain = chain[::-1]
        node_map = h.roots
        node = None
        for i, p in enumerate(chain):
            node = node_map.setdefault(p, HNode())
            if node.fm and i < len(chain) - 1:
                # an fm ANCESTOR already covers this subtree: descending
                # would graft children under an fm node (invariant: fm
                # nodes are childless) — results were unaffected (all
                # consumers check fm first) but node counts /
                # compactify walked phantom nodes (ADVICE r2 #5)
                return
            node_map = node.children
        if fm:
            node.fm = True
            node.children = {}
        elif node.fm:
            pass  # already full (union across terms absorbs pm)
        elif node.items is not None:
            node.items = np.union1d(node.items, items)
        else:
            node.items = np.asarray(items, np.int64)


def open_hcqr_index(eng) -> HcqrTextIndex | None:
    """Open the persisted HCQR artifact next to a loaded engine's index
    (None when absent — e.g. older layouts)."""
    out_dir = getattr(eng, "index_dir", None)
    if not out_dir or not os.path.isdir(os.path.join(out_dir, "hcqr")):
        return None
    # _plookup (not the scalar-only _post bound method) so fm-node
    # flattening takes the bulk post_many path — the 28s→1.1s
    # heavy-query fix reaches the file-backed HCQR completer too
    # (ADVICE r2 #4)
    return HcqrTextIndex(out_dir, eng.grid, eng.level,
                         postings=eng._plookup, leaf_pixels=eng.populated_pixels(),
                         vocab=eng.backend.vocab())


def hcqr_tree(eng, hidx: HcqrTextIndex, query: str) -> HCQR:
    """Evaluate a query through the PERSISTED HCQR payloads and return
    the result TREE: term leaves come from `dir/hcqr/` trees (the
    static-hcqr completer, apps/mainq.cpp:658-670); non-term leaves
    fall back to tree-from-CQR (the reference's hcqr-from-sg completer,
    :640-656).  The tree exposes depth()/number_of_nodes() — the
    reference's per-query compactness stats (apps/mainq.cpp:151-156)."""
    from ..query.parser import AllToFull, SetOp, TermLeaf, parse
    from .text_index import FAMILY_ITEM, FAMILY_MIXED, FAMILY_REGION

    fam_of = {"mixed": FAMILY_MIXED, "region": FAMILY_REGION, "item": FAMILY_ITEM}

    def go(node):
        if isinstance(node, SetOp):
            return go(node.left).apply(node.op, go(node.right))
        if isinstance(node, AllToFull):
            return go(node.child).all_to_full()
        if isinstance(node, TermLeaf):
            names = eng._matching_terms(node.value, node.qt)
            return hidx.tree(names, fam_of[node.flavor])
        return HCQR.from_cqr(eng.evaluate(node), eng.grid, eng.level,
                             eng.populated_pixels())

    return go(parse(query))


def hcqr_complete(eng, hidx: HcqrTextIndex, query: str) -> np.ndarray:
    """hcqr_tree flattened to the sorted doc ids (HCQR::items())."""
    return hcqr_tree(eng, hidx, query).items()
