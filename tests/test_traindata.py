"""Tests for the training-data operators: sketch correctness against
exact recomputation (MinHash recall, SimHash locality), text-analysis
kernels, multimodal plumbing."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from oscar_spatial_index_compare_ray.functions.minhash import (
    hamming64,
    jaccard,
    lsh_bands,
    minhash_signature,
    shingle_hashes,
    simhash,
)
from oscar_spatial_index_compare_ray.functions.textstats import (
    fingerprint,
    lang_id,
    quality_stats,
    token_count,
)

SF = "/root/testdata/sf0.001"


class TestKernels:
    def test_minhash_estimates_jaccard(self):
        a = shingle_hashes("the quick brown fox jumps over the lazy dog " * 5, k=3)
        b = shingle_hashes("the quick brown fox leaps over the lazy dog " * 5, k=3)
        exact = jaccard(a, b)
        sa = minhash_signature(a, 256)
        sb = minhash_signature(b, 256)
        est = (sa == sb).mean()
        assert abs(est - exact) < 0.15

    def test_minhash_identical_docs(self):
        s = shingle_hashes("hello world again and again", k=3)
        assert (minhash_signature(s) == minhash_signature(s.copy())).all()
        assert (lsh_bands(minhash_signature(s)) == lsh_bands(minhash_signature(s))).all()

    def test_simhash_locality(self):
        base = "the quick brown fox jumps over the lazy dog " * 10
        near = base.replace("lazy", "sleepy")
        far = "completely different content about databases and queries " * 10
        h0 = np.array([simhash(base)], dtype=np.uint64)
        h1 = np.array([simhash(near)], dtype=np.uint64)
        h2 = np.array([simhash(far)], dtype=np.uint64)
        assert hamming64(h0, h1)[0] < hamming64(h0, h2)[0]
        assert hamming64(h0, h0)[0] == 0

    def test_lang_id(self):
        en, c1 = lang_id("the cat is on the mat and it is happy with you")
        de, c2 = lang_id("der hund ist in den garten gelaufen und die katze auf das dach")
        assert en == "en" and de == "de" and c1 > 0 and c2 > 0
        assert lang_id("")[0] == "und"
        assert lang_id("zzz qqq xxx")[0] == "und"

    def test_quality_stats(self):
        s = quality_stats("The cat, the cat, the cat!")
        assert s["n_tokens"] == 6
        assert s["n_unique_tokens"] == 2
        assert 0 < s["punct_ratio"] < 1
        assert s["repetition_ratio"] == pytest.approx(1 - 2 / 6, abs=1e-6)
        assert quality_stats("")["n_tokens"] == 0

    def test_token_count(self):
        assert token_count("a b c") == 3

    def test_fingerprint_stable_and_robust(self):
        t = "some long document text that goes on and on " * 8
        f1, f2 = fingerprint(t), fingerprint(t)
        assert (f1 == f2).all()
        # small edit → most fingerprints survive (winnowing locality)
        f3 = fingerprint(t.replace("long", "short", 1))
        overlap = len(np.intersect1d(f1, f3)) / max(len(f1), 1)
        assert overlap > 0.5
        assert len(fingerprint("")) == 0


class TestDedupPipelines:
    @staticmethod
    def _exact_shingle_pairs(tau):
        """Driver-side exact shingle-jaccard pairs (the test oracle)."""
        from oscar_spatial_index_compare_ray.functions.minhash import shingle_hashes

        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        sets = {
            did: shingle_hashes(text, k=3)
            for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        }
        ids = sorted(sets)
        exact = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                j = jaccard(sets[a], sets[b])
                if j >= tau:
                    exact[(a, b)] = j
        return exact

    def test_minhash_lsh_equals_exact_at_tau(self, ray_session):
        """At r=2 × b=32, recall at j >= τ=0.6 is 1-(1-τ²)³² ≈ 1-7e-7 —
        on the deterministic test corpus the verified LSH output must
        EQUAL the exact shingle-jaccard pair set (this equality is what
        licenses the DuckDB oracle for dedup_minhash)."""
        from oscar_spatial_index_compare_ray.pipelines.traindata import q_dedup_minhash

        exact = self._exact_shingle_pairs(0.6)
        lsh = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in q_dedup_minhash(SF, tau=0.6).take_all()
        }
        assert set(lsh) == set(exact)
        for p, j in exact.items():
            assert abs(lsh[p] - j) < 1e-6

    def test_dedup_exact_minimal_keepers(self, ray_session):
        from oscar_spatial_index_compare_ray.pipelines.traindata import q_dedup_exact

        rows = q_dedup_exact(SF).take_all()
        docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        import hashlib

        first = {}
        for did, t in sorted(
            zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        ):
            h = hashlib.md5(t.encode()).hexdigest()
            first.setdefault(h, did)
        assert sorted(r["doc_id"] for r in rows) == sorted(first.values())

    def test_ann_lsh_close_to_brute(self, ray_session):
        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_ann_lsh,
            q_ann_topk,
        )

        brute = [r["vec_id"] for r in q_ann_topk(SF, k=10).to_pylist()]
        approx = q_ann_lsh(SF, k=10).column("vec_id").to_pylist()
        # the approximate top-10 must contain the true top-1 and overlap well
        assert brute[0] == approx[0]
        assert len(set(brute) & set(approx)) >= 5


class TestMultimodal:
    def test_decode_stage_plumbing(self, ray_session):
        import ray.data

        from oscar_spatial_index_compare_ray.stages.multimodal import (
            DecodeImages,
            FakeImageCodec,
            ResizeImages,
            SampleFrames,
            synthetic_media_table,
        )

        media = synthetic_media_table(48)
        ds = ray.data.from_arrow(media)
        out = ds.map_batches(
            DecodeImages,
            fn_constructor_kwargs={"decode_fn": FakeImageCodec()},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=2,
        )
        rows = out.take_all()
        assert len(rows) == 48
        assert all(16 <= r["height"] <= 80 for r in rows)
        # deterministic across runs
        rows2 = ds.map_batches(
            DecodeImages,
            fn_constructor_kwargs={"decode_fn": FakeImageCodec()},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=2,
        ).take_all()
        assert sorted(map(tuple, (r.values() for r in rows))) == sorted(
            map(tuple, (r.values() for r in rows2))
        )
        resized = ds.map_batches(
            ResizeImages,
            fn_constructor_kwargs={"decode_fn": FakeImageCodec(), "max_side": 32},
            batch_format="pyarrow", batch_size=16, concurrency=2,
        ).take_all()
        assert all(max(r["new_height"], r["new_width"]) <= 32 for r in resized)
        frames = ds.filter(lambda r: r["media_type"] == "video").map_batches(
            SampleFrames, batch_format="pyarrow", batch_size=16, concurrency=2
        ).take_all()
        assert len(frames) > 0 and all(r["frame_idx"] % 10 == 0 for r in frames)

    def test_real_decode_raises(self):
        from oscar_spatial_index_compare_ray.stages.multimodal import (
            CodecNotAvailable,
            real_decode,
        )

        with pytest.raises(CodecNotAvailable):
            real_decode(b"xx", "image")


class TestShingleCachePlanner:
    def test_minhash_identical_on_both_shingle_branches(self, ray_session,
                                                        monkeypatch):
        """The shingle-pass planner (cache the packed shingle table in
        the object store vs stream-recompute per consumer) must not
        change output: force the recompute branch — the design-scale
        path — and assert pair-level equality with the cached plan."""
        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_dedup_minhash,
        )

        def rows(ds):
            return sorted(
                (r["doc_a"], r["doc_b"], round(r["jaccard"], 6))
                for r in ds.take_all()
            )

        monkeypatch.delenv("OSIRAY_SHINGLE_CACHE_MAX_DOCS", raising=False)
        cached = rows(q_dedup_minhash(SF, tau=0.6))
        monkeypatch.setenv("OSIRAY_SHINGLE_CACHE_MAX_DOCS", "0")
        streamed = rows(q_dedup_minhash(SF, tau=0.6))
        assert cached == streamed and len(cached) > 0


class TestDedupClusters:
    @pytest.mark.parametrize("path", ["driver", "distributed"])
    def test_clusters_match_union_find(self, ray_session, monkeypatch, path):
        """BOTH planner branches (driver-side numpy finisher and the
        at-scale distributed label-propagation loop) == driver
        union-find over the SAME LSH-verified edge set — the parity
        contract of the planner split (VERDICT r4 #1 pattern)."""
        if path == "distributed":
            # threshold 0 forces the loop that runs at design scale
            monkeypatch.setenv("OSIRAY_CLUSTERS_DRIVER_MAX_EDGES", "0")
        else:
            monkeypatch.delenv("OSIRAY_CLUSTERS_DRIVER_MAX_EDGES",
                               raising=False)
        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_dedup_clusters,
            q_dedup_minhash,
        )

        pairs = [(r["doc_a"], r["doc_b"]) for r in q_dedup_minhash(SF, tau=0.6).take_all()]
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(x, y):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)

        for a, b in pairs:
            union(a, b)
        expected = {x: find(x) for x in parent}
        got = {r["doc_id"]: r["keeper"] for r in q_dedup_clusters(SF, tau=0.6).take_all()}
        assert got == expected
        # keeper is the minimum of its own cluster
        for d, k in got.items():
            assert k <= d and got[k] == k


class TestHoppingWindows:
    def test_each_event_in_two_windows(self, ray_session):
        import pyarrow.parquet as pq

        from oscar_spatial_index_compare_ray.pipelines.traindata import q_events_hopping

        rows = q_events_hopping(SF).take_all()
        n_events = pq.read_metadata(f"{SF}/events.parquet").num_rows
        assert sum(r["n_events"] for r in rows) == 2 * n_events  # width/step = 2
        for r in rows:
            assert r["window_s"] % 3600 == 0


class TestEmbeddingLsh:
    def test_precision_and_recall_vs_brute(self, ray_session):
        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_dedup_embedding,
            q_dedup_embedding_lsh,
        )

        brute = {(r["vec_a"], r["vec_b"]): r["cosine"]
                 for r in q_dedup_embedding(SF, tau=0.45).take_all()}
        lsh = {(r["vec_a"], r["vec_b"]): r["cosine"]
               for r in q_dedup_embedding_lsh(SF, tau=0.45).take_all()}
        assert set(lsh) <= set(brute)  # precision 1 (exact verify)
        for k, v in lsh.items():
            assert v == brute[k]
        if brute:
            assert len(lsh) / len(brute) >= 0.5  # multi-probe recall floor


class TestHLL:
    def test_error_bound_and_merge(self):
        from oscar_spatial_index_compare_ray.functions.hll import HLL

        rng = np.random.default_rng(5)
        vals = rng.integers(0, 2**62, 50_000).astype(np.uint64)
        exact = len(np.unique(vals))
        h = HLL(12).add_ints(vals)
        assert abs(h.count() - exact) / exact < 0.05
        # mergeability: two halves == whole
        h1 = HLL(12).add_ints(vals[:25_000])
        h2 = HLL(12).add_ints(vals[25_000:])
        assert h1.merge(h2).count() == pytest.approx(h.count())
        # serialization round trip
        assert HLL.from_bytes(h.to_bytes()).count() == pytest.approx(h.count())

    def test_query_close_to_exact(self, ray_session):
        import duckdb

        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_approx_distinct_terms,
        )

        approx = q_approx_distinct_terms(SF).column("approx_distinct_terms")[0].as_py()
        con = duckdb.connect()
        exact = con.execute(
            f"SELECT count(DISTINCT term) FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}_]+')) term "
            f"FROM read_parquet('{SF}/documents.parquet')) WHERE term <> ''"
        ).fetchone()[0]
        assert abs(approx - exact) / exact < 0.1


class TestAnnIvf:
    def test_ivf_close_to_brute(self, ray_session):
        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_ann_ivf,
            q_ann_topk,
        )

        brute = [r["vec_id"] for r in q_ann_topk(SF, k=10).to_pylist()]
        ivf = q_ann_ivf(SF, k=10).column("vec_id").to_pylist()
        # the query vector itself lives in a probed bucket → top-1 exact
        assert brute[0] == ivf[0]
        assert len(set(brute) & set(ivf)) >= 5


class TestCorpusFilter:
    def test_filter_matches_stats_predicate(self, ray_session):
        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_corpus_filter,
            q_text_stats,
        )

        stats = {r["doc_id"]: r for r in q_text_stats(SF).take_all()}
        kept = {r["doc_id"] for r in q_corpus_filter(SF).take_all()}
        expect = {
            d for d, r in stats.items()
            if r["n_tokens"] >= 30 and r["repetition_ratio"] < 0.7
            and r["stopword_ratio"] >= 0.01
        }
        assert kept == expect


class TestTfIdf:
    def test_ranks_within_bounds_and_terms_in_doc(self, ray_session):
        import pyarrow.parquet as pq

        from oscar_spatial_index_compare_ray.functions.tokenize import unique_terms
        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_tfidf_top_terms,
        )

        rows = q_tfidf_top_terms(SF, n=3).take_all()
        docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        terms_of = {d: set(unique_terms(t)) for d, t in
                    zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())}
        seen: dict[int, set[int]] = {}
        for r in rows:
            assert 1 <= r["rank"] <= 3
            assert r["term"] in terms_of[r["doc_id"]]
            seen.setdefault(r["doc_id"], set()).add(r["rank"])
        # every non-empty doc gets ranks 1..min(3, vocab)
        for d, rk in seen.items():
            assert rk == set(range(1, len(rk) + 1))


class TestVectorizedTextKernels:
    """The batch-vectorized pipeline kernels must equal the scalar
    reference kernels row for row (the scalar fns define semantics)."""

    def test_lang_id_pipeline_equals_scalar(self, ray_session):
        import pyarrow.parquet as pq

        from oscar_spatial_index_compare_ray.pipelines.traindata import q_lang_id

        rows = {r["doc_id"]: r for r in q_lang_id(SF).take_all()}
        docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
            lg, conf = lang_id(t)
            assert rows[d]["lang_pred"] == lg, d
            assert abs(rows[d]["lang_conf"] - conf) < 1e-9, d

    def test_bpe_count_pipeline_equals_scalar(self, ray_session):
        import pyarrow.parquet as pq

        from oscar_spatial_index_compare_ray.functions.tokenize import (
            bpe_ish_token_count,
        )
        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_token_count_bpe,
        )

        rows = {r["doc_id"]: r["n_bpe_tokens"]
                for r in q_token_count_bpe(SF).take_all()}
        docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
            assert rows[d] == bpe_ish_token_count(t), d


class TestSimhashPipeline:
    def test_pairs_equal_bruteforce(self, ray_session):
        """4x16-bit banding is EXACT for hamming<=3 (pigeonhole: 3 bit
        flips leave >=1 band untouched), so the blocked pipeline must
        equal the all-pairs brute force."""
        import pyarrow.parquet as pq

        from oscar_spatial_index_compare_ray.functions.minhash import (
            hamming64,
            simhash,
        )
        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_dedup_simhash,
        )

        got = {(r["doc_a"], r["doc_b"]): r["hamming"]
               for r in q_dedup_simhash(SF).take_all()}
        docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        ids = docs["doc_id"].to_pylist()
        sigs = np.array([simhash(t) for t in docs["text"].to_pylist()],
                        dtype=np.uint64)
        expect = {}
        for i in range(len(ids)):
            h = hamming64(np.full(len(ids) - i - 1, sigs[i]), sigs[i + 1:])
            for j in np.nonzero(h <= 3)[0]:
                a, b = ids[i], ids[i + 1 + int(j)]
                expect[(min(a, b), max(a, b))] = int(h[j])
        assert got == expect

    def test_fingerprint_pipeline_equals_scalar(self, ray_session):
        import pyarrow.parquet as pq

        from oscar_spatial_index_compare_ray.functions.textstats import (
            fingerprint,
        )
        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_fingerprint,
        )

        rows = {r["doc_id"]: r for r in q_fingerprint(SF).take_all()}
        docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
            sig = fingerprint(t)
            assert rows[d]["n_fp"] == len(sig), d
            assert rows[d]["fp_min"] == (int(sig.min()) if len(sig) else 0), d

    def test_fingerprint_edge_cases(self, ray_session, tmp_path):
        """Docs below the shingle size and below the window size take
        the degenerate branches — absent from the synthetic corpus, so
        exercised with a constructed table."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from oscar_spatial_index_compare_ray.functions.textstats import (
            fingerprint,
        )
        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_fingerprint,
        )

        texts = ["", "one", "two words", "a b c d",        # < k tokens
                 "a b c d e", "a b c d e f g h i j",       # <= window shingles
                 " ".join(f"w{i % 7}" for i in range(40)),  # window minima
                 "x " * 30]
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        rows = {r["doc_id"]: r for r in q_fingerprint(str(tmp_path)).take_all()}
        for d, txt in enumerate(texts):
            sig = fingerprint(txt)
            assert rows[d]["n_fp"] == len(sig), (d, txt)
            assert rows[d]["fp_min"] == (int(sig.min()) if len(sig) else 0), (d, txt)


class TestBatchStreamKernels:
    """The shared batch tokenize/shingle/minhash stream kernels must
    equal the per-doc scalar kernels exactly."""

    def test_shingles_and_token_sets_equal_scalar(self, ray_session):
        import pyarrow.parquet as pq

        from oscar_spatial_index_compare_ray.functions.hashing import token_hashes
        from oscar_spatial_index_compare_ray.functions.minhash import shingle_hashes
        from oscar_spatial_index_compare_ray.functions.tokenize import unique_terms
        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            _doc_shingles,
            _doc_token_sets,
        )

        docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
        sh = {r["doc_id"]: r["shingles"] for r in _doc_shingles(SF).take_all()}
        tk = {r["doc_id"]: r["tokens"] for r in _doc_token_sets(SF).take_all()}
        for d, t in texts.items():
            assert sh[d] == shingle_hashes(t, k=3).tobytes(), d
            assert tk[d] == np.unique(token_hashes(unique_terms(t))).tobytes(), d

    def test_minhash_bands_equal_scalar(self, ray_session):
        import pyarrow.parquet as pq

        from oscar_spatial_index_compare_ray.functions.minhash import (
            lsh_bands,
            minhash_signature,
            shingle_hashes,
        )
        from oscar_spatial_index_compare_ray.pipelines.traindata import read_table

        import pyarrow as pa

        from oscar_spatial_index_compare_ray.pipelines import traindata as td

        docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        batch = pa.table({"doc_id": docs["doc_id"].combine_chunks(),
                          "text": docs["text"].combine_chunks()})
        # scalar expectation per (doc, band)
        got = {}
        for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
            sig = minhash_signature(shingle_hashes(t, k=3), 64)
            for b, h in enumerate(lsh_bands(sig, 32)):
                got[(d, b)] = int(h) - (1 << 64 if int(h) >= 1 << 63 else 0)
        assert td.q_dedup_minhash(SF).count() >= 0  # pipeline stays green
        # direct stage check: batch-vectorized band hashes equal scalar
        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            _batch_token_stream,
            _stream_doc_shingles,
        )
        from oscar_spatial_index_compare_ray.functions.hashing import splitmix64

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        drep, th, n_tok, n = _batch_token_stream(batch)
        _, sv, st = _stream_doc_shingles(drep, th, n_tok, n, 3)
        seeds = splitmix64(np.arange(64, dtype=np.uint64) ^ np.uint64(0x5EED))
        has = np.diff(st) > 0
        seg_starts = st[:-1][has]
        sig = np.full((n, 64), np.iinfo(np.uint64).max, np.uint64)
        for hi in range(64):
            if len(sv) and len(seg_starts):
                sig[has, hi] = np.minimum.reduceat(splitmix64(sv ^ seeds[hi]), seg_starts)
        for b in range(32):
            h = np.full(n, np.uint64(b + 1), np.uint64)
            for r in range(2):
                h = splitmix64(h ^ sig[:, b * 2 + r])
            for i, d in enumerate(ids):
                expect = got[(int(d), b)]
                assert int(h[i].view(np.int64)) == expect, (d, b)


class TestPiiScrub:
    def test_planted_pii_redacted(self, ray_session):
        """The same kernel chain the pipeline uses must redact planted
        PII (the synthetic corpus has none — the oracle only checks the
        identity path)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            PII_PATTERNS,
        )

        cases = [
            ("mail me at bob.smith+x@example.co.uk today", "mail me at <EMAIL> today", 1),
            ("see https://a.example.com/p?q=1 and http://b.io", "see <URL> and <URL>", 2),
            ("call +1 555-123-4567 now", "call <PHONE> now", 1),
            ("ftp://no.scheme and plain text", "ftp://no.scheme and plain text", 0),
            # a URL that embeds an email-shaped substring: URL wins
            # (replacement order is part of the operator definition)
            ("go https://x.io/a@b.cd end", "go <URL> end", 2),
        ]
        txt = pa.array([c[0] for c in cases], pa.string())
        n = None
        for _, pat, _r in PII_PATTERNS:
            c = pc.count_substring_regex(txt, pattern=pat)
            n = c if n is None else pc.add(n, c)
        out = txt
        for _, pat, repl in PII_PATTERNS:
            out = pc.replace_substring_regex(out, pattern=pat, replacement=repl)
        assert out.to_pylist() == [c[1] for c in cases]
        assert n.to_pylist() == [c[2] for c in cases]

    def test_corpus_identity_and_counts(self, ray_session):
        from oscar_spatial_index_compare_ray.pipelines.traindata import q_pii_scrub

        rows = q_pii_scrub(SF).take(5)
        assert all(r["n_redactions"] == 0 for r in rows)


class TestContamination:
    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from oscar_spatial_index_compare_ray.functions.minhash import (
            shingle_hashes,
        )
        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_contamination,
        )

        got = {r["doc_id"]: r["n_shared"] for r in q_contamination(SF).take_all()}
        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        ev = np.unique(np.concatenate(
            [shingle_hashes(tx) for i, tx in zip(ids, texts) if i < 50]
            or [np.empty(0, np.uint64)]
        ))
        expect = {}
        for i, tx in zip(ids, texts):
            if i < 50:
                continue
            n = int(np.isin(shingle_hashes(tx), ev).sum())
            if n > 0:
                expect[i] = n
        assert got == expect
        assert len(got) > 0  # the word-salad corpus must overlap


class TestSampleStratified:
    def test_deterministic_and_near_rate(self, ray_session):
        import hashlib

        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_sample_stratified,
        )

        a = sorted(r["doc_id"] for r in q_sample_stratified(SF).take_all())
        b = sorted(r["doc_id"] for r in q_sample_stratified(SF).take_all())
        assert a == b  # parallelism/order independent
        for d in a[:20]:
            assert hashlib.md5(str(d).encode()).digest()[0] < 51
        # ~20% +- generous binomial slack on 500 docs
        assert 0.10 < len(a) / 500 < 0.32


class TestEventsAsof:
    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_events_asof,
        )

        got = {r["event_id"]: (r["matched_id"], r["lag_sec"])
               for r in q_events_asof(SF).take_all()}
        t = pq.read_table(f"{SF}/events.parquet",
                          columns=["event_id", "ts", "user_id", "event_type"])
        rows = sorted(
            (r["user_id"], r["ts"], r["event_id"], r["event_type"])
            for r in t.to_pylist()
            if r["event_type"] in ("purchase", "click")
        )
        expect = {}
        last_click: dict[int, tuple] = {}
        for u, ts, eid, ty in rows:
            if ty == "click":
                last_click[u] = (eid, ts)
            elif u in last_click:
                mid, mts = last_click[u]
                expect[eid] = (mid, round((ts - mts).total_seconds(), 6))
        assert got == expect
        assert len(got) > 50


class TestEventsRangeJoin:
    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq

        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_events_range_join,
        )

        got = {r["event_id"]: (r["session_idx"], r["session_start"])
               for r in q_events_range_join(SF).take_all()}
        t = pq.read_table(f"{SF}/events.parquet",
                          columns=["event_id", "ts", "user_id", "event_type"])
        rows = t.to_pylist()
        # sessions per user from non-error events, gap > 24h
        byu: dict[int, list] = {}
        for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
            if r["event_type"] != "error":
                byu.setdefault(r["user_id"], []).append(r["ts"])
        sess: dict[int, list] = {}
        for uu, tss in byu.items():
            ivs = []
            for ts in tss:
                if ivs and (ts - ivs[-1][1]).total_seconds() <= 86400:
                    ivs[-1][1] = ts
                else:
                    ivs.append([ts, ts])
            sess[uu] = ivs
        expect = {}
        for r in rows:
            if r["event_type"] != "error":
                continue
            for i, (a, b) in enumerate(sess.get(r["user_id"], []), start=1):
                if a <= r["ts"] <= b:
                    expect[r["event_id"]] = (
                        i, int(a.timestamp() * 1_000_000)
                    )
                    break
        assert got == expect
        assert len(got) > 20

    def test_probe_tied_with_session_start(self, ray_session, tmp_path):
        """A probe whose ts EQUALS a session's first event but sorts
        before it (smaller event_id) is still contained (BETWEEN
        semantics) — the forward-fill alone would miss it."""
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from oscar_spatial_index_compare_ray.pipelines.traindata import (
            q_events_range_join,
        )

        t0 = dt.datetime(2024, 1, 1)
        t2 = t0 + dt.timedelta(days=3)  # > 24h gap => new session
        rows = [
            # user 1: session 1 = [t0], session 2 = [t2, t2+1h]
            (10, t0, 1, "view"),
            (11, t2, 1, "view"),
            (12, t2 + dt.timedelta(hours=1), 1, "view"),
            # error tied with session 2's start, smaller event_id
            (5, t2, 1, "error"),
            # error tied with session 1's only event (on_end path)
            (6, t0, 1, "error"),
            # error in the 3-day gap: no session contains it
            (7, t0 + dt.timedelta(days=1), 1, "error"),
        ]
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        pq.write_table(tbl, str(tmp_path / "events.parquet"))
        got = {r["event_id"]: (r["session_idx"], r["session_start"])
               for r in q_events_range_join(str(tmp_path)).take_all()}
        us = 1_000_000
        assert got == {
            5: (2, int(t2.timestamp() * us)),
            6: (1, int(t0.timestamp() * us)),
        }
