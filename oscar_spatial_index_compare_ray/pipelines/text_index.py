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
    """Distinct (doc_id, pixel) pairs from the assignments table
    (combiner + hash-partitioned vectorized dedup)."""
    from ..stages.groupagg import grouped_distinct

    return grouped_distinct(assignments.select_columns(["doc_id", pixel_col]),
                            ["doc_id", pixel_col])


def pixel_doc_counts(doc_pix: ray.data.Dataset, pixel_col: str) -> tuple[np.ndarray, np.ndarray]:
    """(sorted pixel array, doc-count array) — the SMALL broadcast side
    of fm/pm classification, analogue of the per-trixel item counts in
    OscarSearchSgIndex::State (src/OscarSearchSgIndex.cpp:365-391).

    doc_pix is already distinct → a plain per-block count + driver merge
    (the result is one row per populated pixel: small by construction)."""
    def cnt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({pixel_col: pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return batch.group_by([pixel_col]).aggregate([("doc_id", "count")]).rename_columns([pixel_col, "n"])

    rows = doc_pix.map_batches(cnt, batch_format="pyarrow", zero_copy_batch=True).take_all()
    # merge per-block partial counts driver-side (pixels may span blocks)
    acc: dict[int, int] = {}
    for r in rows:
        acc[int(r[pixel_col])] = acc.get(int(r[pixel_col]), 0) + int(r["n"])
    pix = np.array(sorted(acc), dtype=np.int64)
    n = np.array([acc[int(p)] for p in pix], dtype=np.int64)
    return pix, n


class _BlockClassifier:
    """map_batches callable over term-hash-partitioned blocks: ALL rows
    of a term live in the block, so every (term, pixel) group completes
    here.  Fully vectorized across the block's many terms (one lexsort);
    broadcast per-pixel totals fetched once per actor.

    fm rows carry an EMPTY items list (reconstructable from postings,
    like the reference's bare fmTrixel ids)."""

    def __init__(self, counts_ref, pixel_col: str, term_col: str = "term"):
        self.counts_ref = counts_ref
        self.pixel_col = pixel_col
        self.term_col = term_col
        self._lookup = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_term_type = (
            pa.string() if self.term_col == "term" else pa.int64()
        )
        if batch.num_rows == 0:
            return pa.table(
                {
                    self.term_col: pa.array([], out_term_type),
                    "pixel": pa.array([], pa.int64()),
                    "fm": pa.array([], pa.bool_()),
                    "n": pa.array([], pa.int64()),
                    "items": pa.array([], pa.list_(pa.int64())),
                }
            )
        if self._lookup is None:
            self._lookup = ray.get(self.counts_ref)
        tot_pix, tot_n = self._lookup
        # C++ dictionary-encode: term codes without materializing Python
        # strings (np.unique over object arrays measured 10× slower);
        # int64 term-hash columns skip the encode entirely
        import pyarrow.compute as pc

        tcol = batch.column(self.term_col)
        d = pc.dictionary_encode(tcol.combine_chunks() if isinstance(tcol, pa.ChunkedArray) else tcol)
        term_dict = d.dictionary
        tcode = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pix = batch.column(self.pixel_col).to_numpy(zero_copy_only=False)
        docs = batch.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, pix, tcode))
        t, p, d = tcode[order], pix[order], docs[order]
        keep = np.ones(len(t), dtype=bool)
        keep[1:] = (t[1:] != t[:-1]) | (p[1:] != p[:-1]) | (d[1:] != d[:-1])
        t, p, d = t[keep], p[keep], d[keep]
        gstart = np.nonzero(np.r_[True, (t[1:] != t[:-1]) | (p[1:] != p[:-1])])[0]
        gt, gp = t[gstart], p[gstart]
        ns = np.diff(np.r_[gstart, len(t)])
        idx = np.clip(np.searchsorted(tot_pix, gp), 0, max(len(tot_pix) - 1, 0))
        totals = np.where(tot_pix[idx] == gp, tot_n[idx], -1) if len(tot_pix) else np.full(len(gp), -1)
        fm = ns == totals
        # items: per group, docs — empty for fm groups
        g_of_row = np.repeat(np.arange(len(gstart)), ns)
        row_keep = ~fm[g_of_row]
        vals = d[row_keep]
        counts = np.where(fm, 0, ns)
        offsets = np.zeros(len(gstart) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        if offsets[-1] < 2**31:
            items = pa.ListArray.from_arrays(
                pa.array(offsets.astype(np.int32), pa.int32()), pa.array(vals)
            )
        else:  # >=2^31 items in one term partition: large_list offsets
            items = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(vals))
        out_terms = term_dict.take(pa.array(gt, pa.int64()))  # C++ gather
        return pa.table(
            {
                self.term_col: out_terms,
                "pixel": pa.array(gp, pa.int64()),
                "fm": pa.array(fm, pa.bool_()),
                "n": pa.array(ns, pa.int64()),
                "items": items,
            }
        )


def _hash_terms(batch: pa.Table) -> pa.Table:
    """(doc_id, term) → (doc_id, term_hash): the wide exchanges carry an
    int64 instead of strings.  64-bit stable hash per DISTINCT term of
    the batch (dictionary-encode first); string↔hash mapping travels in
    the tiny vocab side table."""
    import pyarrow.compute as pc

    from ..functions.hashing import token_hashes

    if batch.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "term_hash": pa.array([], pa.int64())})
    col = batch.column("term")
    d = pc.dictionary_encode(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    uniq = token_hashes(d.dictionary.to_pylist()).view(np.int64)
    th = uniq[d.indices.to_numpy(zero_copy_only=False)]
    return pa.table({"doc_id": batch.column("doc_id"), "term_hash": pa.array(th, pa.int64())})


def build_vocab(terms: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct (term_hash, term) — the FlatTrie analogue's string side
    (small: one row per distinct corpus term)."""
    from ..stages.groupagg import grouped_distinct

    def add_hash(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.hashing import token_hashes

        if batch.num_rows == 0:
            return pa.table({"term_hash": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string())})
        col = batch.column("term")
        d = pc.dictionary_encode(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        uniq = token_hashes(d.dictionary.to_pylist()).view(np.int64)
        th = uniq[d.indices.to_numpy(zero_copy_only=False)]
        return pa.table({"term_hash": pa.array(th, pa.int64()), "term": col})

    return grouped_distinct(
        terms.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True),
        ["term_hash", "term"],
    )


def build_text_index(
    corpus_dir: str,
    assignments: ray.data.Dataset,
    pixel_col: str = "h3_cell",
    num_partitions: int = 16,
    hash_exchange: bool = False,
) -> ray.data.Dataset:
    """Full text-index build; returns the text_index Dataset.

    Wide steps: one hash join on doc_id (terms ⋈ doc-pixels), one hash
    repartition on term (shuffle #2, src/OscarSearchSgIndex.cpp:91-103's
    per-string work distribution), then vectorized per-block
    classification — no per-group Python.

    ``hash_exchange=True`` replaces term strings with 64-bit hashes in
    the wide exchanges (strings re-attached from a distinct vocab at
    the end).  Measured SLOWER at sf0.1 on one node (118 s vs 72 s: the
    vocab distinct + re-attach pass cost more than the string bytes
    saved through a local object store); on a multi-node cluster where
    shuffle bytes cross the network the tradeoff flips — hence the
    flag, default off."""
    import ray as _ray

    terms = tokenize_pages(corpus_dir)
    if not hash_exchange:
        dp = doc_pixels(assignments, pixel_col)
        counts_ref = ray.put(pixel_doc_counts(dp, pixel_col))
        pairs = terms.join(dp, join_type="inner", num_partitions=num_partitions, on=("doc_id",))
        from ..stages.groupagg import _partitioned_apply

        return _partitioned_apply(
            pairs, ["term"], num_partitions, _BlockClassifier(counts_ref, pixel_col)
        )
    vocab = build_vocab(terms).materialize()  # small: one row per distinct term
    hashed = terms.map_batches(_hash_terms, batch_format="pyarrow", zero_copy_batch=True)
    dp = doc_pixels(assignments, pixel_col)
    counts_ref = ray.put(pixel_doc_counts(dp, pixel_col))
    pairs = hashed.join(dp, join_type="inner", num_partitions=num_partitions, on=("doc_id",))
    from ..stages.groupagg import _partitioned_apply

    entries = _partitioned_apply(
        pairs, ["term_hash"], num_partitions,
        _BlockClassifier(counts_ref, pixel_col, term_col="term_hash"),
    )

    # re-attach term strings from the broadcast vocab
    vblocks = [b for b in _ray.get(vocab.to_arrow_refs()) if b.num_rows]
    vt = pa.concat_tables(vblocks).combine_chunks()
    vh = vt.column("term_hash").to_numpy(zero_copy_only=False)
    order = np.argsort(vh)
    vocab_ref = _ray.put((vh[order], vt.column("term").take(pa.array(order))))

    class AttachTerm:
        def __init__(self):
            self.vh, self.vs = _ray.get(vocab_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "term": pa.array([], pa.string()),
                        "pixel": pa.array([], pa.int64()),
                        "fm": pa.array([], pa.bool_()),
                        "n": pa.array([], pa.int64()),
                        "items": pa.array([], pa.list_(pa.int64())),
                    }
                )
            th = batch.column("term_hash").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.vh, th)
            terms_col = self.vs.take(pa.array(idx, pa.int64()))
            return pa.table(
                {
                    "term": terms_col,
                    "pixel": batch.column("pixel"),
                    "fm": batch.column("fm"),
                    "n": batch.column("n"),
                    "items": batch.column("items"),
                }
            )

    return entries.map_batches(AttachTerm, batch_format="pyarrow",
                               zero_copy_batch=True, concurrency=(1, 8))


def build_pixel_postings(doc_pix: ray.data.Dataset, pixel_col: str) -> ray.data.Dataset:
    """pixel → sorted doc posting list (ItemIndex-store analogue) with a
    deterministic content-hash ``index_id`` — the coordination-free
    replacement for the shared mutex'd ItemIndexFactory
    (src/OscarSearchSgIndex.cpp:190,196-197; SURVEY.md §2.4).

    Vectorized: hash-partitioned list collect, then per-block content
    hashing of each list (the only per-list Python is the md5 call)."""
    from ..functions.hashing import content_hash_u32_list
    from ..stages.groupagg import grouped_sorted_unique_lists, _list_array_parts

    lists = grouped_sorted_unique_lists(doc_pix, [pixel_col], "doc_id",
                                        out_col="items", count_col=None)

    def add_hash(batch: pa.Table) -> pa.Table:
        offsets, values = _list_array_parts(batch.column("items")) if batch.num_rows else (np.zeros(1, np.int64), np.empty(0, np.int64))
        ids = []
        u32 = (values.view(np.uint64) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        for i in range(batch.num_rows):
            h = content_hash_u32_list(u32[offsets[i]: offsets[i + 1]])
            ids.append(h - (1 << 64) if h >= (1 << 63) else h)
        out = pa.table(
            {
                "pixel": batch.column(pixel_col),
                "items": batch.column("items"),
                "index_id": pa.array(ids, pa.int64()),
            }
        )
        return out

    return lists.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
