"""Text-index construction — the reference's stage B re-expressed as a
Ray Data graph (src/OscarSearchSgIndex.cpp:362-411, SURVEY.md §3.1).

Reference semantics per (string, query-type): expand the string's
full-match cells to trixels, intersect partial-match item lists per
trixel, then classify each trixel as FULL (every item of the trixel
matches) or PARTIAL (carry the matching-item posting list)
(src/OscarSearchSgIndex.cpp:106-197).

Engine graph:

    terms   = pages → map_batches(tokenize → (doc_id, term) distinct)
    docpix  = assignments → distinct (doc_id, pixel)
    pairs   = terms ⋈ docpix on doc_id            # hash join (wide)
    entries = pairs.groupby(term)                  # shuffle #2
              → vectorized per-pixel classification vs broadcast
                pixel→total-docs lookup

Output table ``text_index``: one row per (term, pixel):
    term: string, pixel: int64, fm: bool, n: int64, items: list<int64>
    (items NULL for fm rows — reconstructable from the pixel postings,
    exactly like the reference storing fmTrixels as bare trixel ids,
    src/OscarSearchSgIndex.cpp:185-197)

Skew note (SURVEY.md §4): hot terms (stop words) make fat groups; the
per-term work is fully vectorized (lexsort + run-length bounds), so a
group costs O(rows log rows) numpy, not Python per row.  At much larger
corpora, salt the term key (term, hash(doc) % k) and merge the k
partials' per-pixel doc lists — both halves stay vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.tokenize import unique_terms
from ..sources.readers import read_pages


def tokenize_pages(corpus_dir: str) -> ray.data.Dataset:
    """pages → distinct (doc_id, term) rows."""
    ds = read_pages(corpus_dir, columns=["doc_id", "text"])

    def tok(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        out_ids, out_terms = [], []
        for did, t in zip(ids, texts):
            terms = unique_terms(t)
            out_ids.append(np.full(len(terms), did, dtype=np.int64))
            out_terms.extend(terms)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_ids) if out_ids else np.empty(0, np.int64)),
                "term": pa.array(out_terms, pa.string()),
            }
        )

    return ds.map_batches(tok, batch_format="pyarrow", zero_copy_batch=True)


def doc_pixels(assignments: ray.data.Dataset, pixel_col: str) -> ray.data.Dataset:
    """Distinct (doc_id, pixel) pairs from the assignments table."""
    from ray.data.aggregate import Count

    slim = assignments.select_columns(["doc_id", pixel_col])
    slim = slim.map_batches(
        lambda b: b.group_by(["doc_id", pixel_col]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return (
        slim.groupby(["doc_id", pixel_col])
        .aggregate(Count(alias_name="_dup"))
        .drop_columns(["_dup"])
    )


def pixel_doc_counts(doc_pix: ray.data.Dataset, pixel_col: str) -> tuple[np.ndarray, np.ndarray]:
    """(sorted pixel array, doc-count array) — the SMALL broadcast side
    of fm/pm classification, analogue of the per-trixel item counts in
    OscarSearchSgIndex::State (src/OscarSearchSgIndex.cpp:365-391)."""
    from ray.data.aggregate import Count

    rows = doc_pix.groupby(pixel_col).aggregate(Count(alias_name="n")).take_all()
    pix = np.array([int(r[pixel_col]) for r in rows], dtype=np.int64)
    n = np.array([int(r["n"]) for r in rows], dtype=np.int64)
    o = np.argsort(pix)
    return pix[o], n[o]


class _TermClassifier:
    """map_groups callable: one term's (doc, pixel) rows → per-pixel
    fm/pm entries.  The broadcast lookup arrays are fetched from the
    object store once per worker process (cached on self)."""

    __name__ = "classify_terms"  # map_groups wraps plain functions; give it a name

    def __init__(self, counts_ref, pixel_col: str):
        self.counts_ref = counts_ref
        self.pixel_col = pixel_col
        self._lookup = None

    def __call__(self, group: pa.Table) -> pa.Table:
        if self._lookup is None:
            self._lookup = ray.get(self.counts_ref)
        tot_pix, tot_n = self._lookup
        term = group.column("term")[0].as_py()
        pix = group.column(self.pixel_col).to_numpy(zero_copy_only=False)
        docs = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, pix))
        pix, docs = pix[order], docs[order]
        keep = np.ones(len(pix), dtype=bool)
        keep[1:] = (pix[1:] != pix[:-1]) | (docs[1:] != docs[:-1])
        pix, docs = pix[keep], docs[keep]
        starts = np.nonzero(np.r_[True, pix[1:] != pix[:-1]])[0]
        upix = pix[starts]
        ns = np.diff(np.r_[starts, len(pix)])
        idx = np.searchsorted(tot_pix, upix)
        idx = np.clip(idx, 0, len(tot_pix) - 1)
        totals = np.where(tot_pix[idx] == upix, tot_n[idx], -1)
        fm = ns == totals
        items = [
            None if f else docs[s: s + n].tolist()
            for f, s, n in zip(fm, starts, ns)
        ]
        return pa.table(
            {
                "term": pa.array([term] * len(upix), pa.string()),
                "pixel": pa.array(upix, pa.int64()),
                "fm": pa.array(fm, pa.bool_()),
                "n": pa.array(ns, pa.int64()),
                "items": pa.array(items, pa.list_(pa.int64())),
            }
        )


def build_text_index(
    corpus_dir: str,
    assignments: ray.data.Dataset,
    pixel_col: str = "h3_cell",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Full text-index build; returns the text_index Dataset."""
    terms = tokenize_pages(corpus_dir)
    dp = doc_pixels(assignments, pixel_col)
    counts_ref = ray.put(pixel_doc_counts(dp, pixel_col))
    pairs = terms.join(dp, join_type="inner", num_partitions=num_partitions, on=("doc_id",))
    return pairs.groupby("term").map_groups(
        _TermClassifier(counts_ref, pixel_col), batch_format="pyarrow"
    )


def build_pixel_postings(doc_pix: ray.data.Dataset, pixel_col: str) -> ray.data.Dataset:
    """pixel → sorted doc posting list (ItemIndex-store analogue) with a
    deterministic content-hash ``index_id`` — the coordination-free
    replacement for the shared mutex'd ItemIndexFactory
    (src/OscarSearchSgIndex.cpp:190,196-197; SURVEY.md §2.4)."""
    from ..functions.hashing import content_hash_u32_list

    def collect(group: pa.Table) -> pa.Table:
        docs = np.unique(group.column("doc_id").to_numpy(zero_copy_only=False))
        h = content_hash_u32_list((docs.astype(np.int64).view(np.uint64) & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        h_signed = h - (1 << 64) if h >= (1 << 63) else h
        return pa.table(
            {
                "pixel": pa.array([group.column(pixel_col)[0].as_py()], pa.int64()),
                "items": pa.array([docs.tolist()], pa.list_(pa.int64())),
                "index_id": pa.array([h_signed], pa.int64()),
            }
        )

    return doc_pix.groupby(pixel_col).map_groups(collect, batch_format="pyarrow")
