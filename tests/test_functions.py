"""Unit tests for the pure kernels (text extraction, geotags, tokenize,
hashing) — the engine's analogue of the reference's
SSERIALIZE_EXPENSIVE_ASSERT invariants (SURVEY.md §5)."""

import numpy as np
import pyarrow.parquet as pq

from oscar_spatial_index_compare_ray.functions.geotags import extract_geotags
from oscar_spatial_index_compare_ray.functions.hashing import (
    content_hash_u32_list,
    splitmix64,
    stable_hash64_str,
    token_hashes,
)
from oscar_spatial_index_compare_ray.functions.text_extract import (
    escape_text,
    extract_text,
)
from oscar_spatial_index_compare_ray.functions.tokenize import tokenize, unique_terms


class TestExtractText:
    def test_round_trip(self):
        text = 'hello <world> & "friends" it\'s geo:48.7758,9.1829'
        html = b"<html><body><nav>x</nav><main>" + escape_text(text) + b"</main></body></html>"
        assert extract_text(html) == text

    def test_strips_script_style(self):
        html = b"<html><script>var a='<main>nope</main>';</script><main>yes</main></html>"
        assert extract_text(html) == "yes"

    def test_no_main_strips_all_tags(self):
        assert extract_text(b"<p>a</p><p>b</p>") == "ab"

    def test_empty_and_none(self):
        assert extract_text(b"") == ""
        assert extract_text(None) == ""

    def test_byte_identical_per_url(self, corpus):
        """North-rule invariant: extract_text(html) == text for every page."""
        pages = pq.read_table(f"{corpus}/pages.parquet")
        for html, text in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
            assert extract_text(html) == text


class TestExtractTextBatchParity:
    """The vectorized Arrow/RE2 batch extractor must be character-
    identical to the scalar spec on every input — including invalid
    UTF-8 (fallback decode path) and a valid-only batch (cast path)."""

    FRAGS = [
        "<script>x='</main>'</script>", "<style a=b>s</style>", "<main>",
        "</main>", "<main class='x'>", "<p>", "&amp;", "&lt;tag&gt;",
        "plain ", "café Привет ", "<MaIn>Mid</mAiN>", "<script>unclosed ",
        "< notatag", ">", "<", "日本語", "<script >sp</script >",
        "nested <main>in</main> two <main>b</main>", "<scripty>odd</scripty>",
        # U+017F ſ folds to 's' under Unicode simple case folding: RE2
        # (?i) would treat <ſcript> as <script>; the explicit-ASCII-class
        # patterns must NOT (scalar and batch must agree it's a plain tag)
        "<ſcript>not-js</ſcript>", "<ſtyle>x</ſtyle> <MaIn>Keep</mAiN>",
    ]

    def _cases(self, seed):
        import random

        rng = random.Random(seed)
        return [
            "".join(rng.choice(self.FRAGS) for _ in range(rng.randint(0, 10))).encode()
            for _ in range(150)
        ]

    def test_valid_utf8_cast_path(self):
        import pyarrow as pa

        from oscar_spatial_index_compare_ray.stages.extract import (
            extract_text_batch,
        )

        cases = self._cases(7)
        got = extract_text_batch(
            pa.table({"html": pa.array(cases, pa.binary())})
        ).column("text").to_pylist()
        assert got == [extract_text(h) for h in cases]

    def test_invalid_utf8_fallback_path(self):
        import pyarrow as pa

        from oscar_spatial_index_compare_ray.stages.extract import (
            extract_text_batch,
        )

        cases = self._cases(11) + [
            b"\xff<p>a</p>\xfe", b"caf\xc3<main>x</main>\xa9",
            b"\xc3\xa9 ok <b>t</b>", b"", None,
        ]
        got = extract_text_batch(
            pa.table({"html": pa.array(cases, pa.binary())})
        ).column("text").to_pylist()
        assert got == [extract_text(h) for h in cases]


class TestExplodeBatchParity:
    """The whole-batch Arrow/RE2 geotag explode must match the scalar
    extract_geotags row-for-row, including fake-marker text, interleaved
    forms, out-of-range coords, empty and null rows."""

    def test_differential(self):
        import random

        import numpy as np
        import pyarrow as pa

        from oscar_spatial_index_compare_ray.stages.extract import (
            explode_points_batch,
        )

        rng = random.Random(3)
        frags = [
            "geo:48.7758,9.1829", " x ", "(lat -1.5000, lon 10.0000)",
            "geo:95.0000,10.0000", "(lat 2, lon 3)", "geo:abc,def",
            "\x01fake 1.0 \x022.0\x03", "geo:-90.000,-180.000",
            "plain text", "geo:12.3,45.6geo:1.1,2.2",
            "(lat 1.0, lon 2.0geo:9.9,8.8)", "",
            "(lat geo:1.0,2.0, lon 3.0)", "geo:1.0,(lat 2.0, lon 3.0)",
        ]
        texts = ["".join(rng.choice(frags) for _ in range(rng.randint(0, 8)))
                 for _ in range(300)] + [None, "", "geo:1.123,2.456"]
        batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                          "text": pa.array(texts, pa.string())})
        out = explode_points_batch(batch)
        got = list(zip(out.column("doc_id").to_pylist(),
                       out.column("point_idx").to_pylist(),
                       out.column("lat").to_pylist(),
                       out.column("lon").to_pylist()))
        want = [(i, j, la, lo)
                for i, t in enumerate(texts)
                for j, (la, lo) in enumerate(extract_geotags(t or ""))]
        assert got == want and len(got) > 100


class TestGeotags:
    def test_both_formats_in_order(self):
        text = "a geo:48.7758,9.1829 b (lat -1.5000, lon 10.0000) c"
        assert extract_geotags(text) == [(48.7758, 9.1829), (-1.5, 10.0)]

    def test_out_of_range_dropped(self):
        assert extract_geotags("geo:95.0000,10.0000") == []
        assert extract_geotags("geo:10.0000,190.0000") == []

    def test_malformed_ignored(self):
        # analogue of invalid-cell warning path, src/OscarSgIndex.cpp:150-155
        assert extract_geotags("geo:abc,def geo:1.0 (lat 2, lon 3)") == []
        assert extract_geotags("") == []
        assert extract_geotags(None) == []

    def test_golden_points(self, corpus):
        pages = pq.read_table(f"{corpus}/pages.parquet")
        points = pq.read_table(f"{corpus}/points.parquet")
        golden: dict[int, list] = {}
        for r in points.to_pylist():
            golden.setdefault(r["doc_id"], []).append((r["lat"], r["lon"]))
        for text, did in zip(pages["text"].to_pylist(), pages["doc_id"].to_pylist()):
            assert extract_geotags(text) == golden.get(did, [])


class TestTokenize:
    def test_lowercase_and_unicode(self):
        assert tokenize("Hello WORLD Straße") == ["hello", "world", "straße"]
        # utf8_lower, not casefold: ß stays ß (term identity is the
        # Arrow kernel, shared byte-for-byte with the batch paths)
        assert tokenize("Café au LAIT, naïve") == ["café", "au", "lait", "naïve"]
        assert tokenize("ПРИВЕТ мир") == ["привет", "мир"]

    def test_unique_sorted(self):
        assert unique_terms("b a b c a") == ["a", "b", "c"]

    def test_empty(self):
        assert tokenize("") == []
        assert tokenize(None) == []


class TestHashing:
    def test_stable_across_calls(self):
        assert stable_hash64_str("abc") == stable_hash64_str("abc")
        assert stable_hash64_str("abc") != stable_hash64_str("abd")

    def test_content_hash_order_sensitive_input_sorted(self):
        a = np.array([1, 2, 3], dtype=np.uint32)
        assert content_hash_u32_list(a) == content_hash_u32_list(a.copy())

    def test_splitmix_vectorized(self):
        x = np.arange(10, dtype=np.uint64)
        y = splitmix64(x)
        assert len(np.unique(y)) == 10
        assert (splitmix64(x) == y).all()

    def test_token_hashes(self):
        h = token_hashes(["a", "b", "a"])
        assert h[0] == h[2] and h[0] != h[1]


class TestBpeIshTokens:
    def test_counts(self):
        from oscar_spatial_index_compare_ray.functions.tokenize import (
            bpe_ish_token_count,
        )

        assert bpe_ish_token_count("") == 0
        assert bpe_ish_token_count("hello world") == 2
        # contraction splits: "don" + "'t"
        assert bpe_ish_token_count("don't") == 2
        # punctuation is its own token; numbers separate from words
        assert bpe_ish_token_count("a1 b!") == 4
        assert bpe_ish_token_count("x" * 10) == 1

    def test_non_ascii_whitespace_scope(self):
        """Documented divergence (round-3 ADVICE): the scalar counter's
        Python ``\\s`` excludes U+00A0 as whitespace, while the
        vectorized/SQL RE2 path counts it as a punctuation pretoken.
        The token model is ASCII-whitespace-scoped; this test pins the
        scalar side of that contract."""
        from oscar_spatial_index_compare_ray.functions.tokenize import (
            bpe_ish_token_count,
        )

        import pyarrow as pa
        import pyarrow.compute as pc

        s = "a b"
        assert bpe_ish_token_count(s) == 2  # U+00A0 dropped as whitespace
        # the RE2 pattern the vectorized path uses counts it: 3 pretokens
        # (RE2 \s is ASCII-only; Python \s is Unicode)
        pat = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
        got = pc.count_substring_regex(pa.array([s]), pattern=pat)[0].as_py()
        assert got == 3


class TestTokenModelParity:
    """The ONE token model (utf8_lower + split on TOKEN_SPLIT_RE) must
    agree byte-for-byte across scalar / Arrow-batch / DuckDB-oracle
    paths, including non-ASCII text (round-3 ADVICE medium)."""

    SAMPLES = [
        "Café au LAIT",
        "ПРИВЕТ мир",
        "naïve Straße İstanbul",
        "foo bar",
        "a_b-c 42",
        "日本語 テスト",
        "étude",  # NFD combining mark splits (documented)
        "",
        "   ",
        "HELLO world hello",
    ]

    def test_scalar_equals_arrow_batch(self):
        import pyarrow as pa
        import pyarrow.compute as pc

        from oscar_spatial_index_compare_ray.functions.tokenize import (
            TOKEN_SPLIT_RE,
            tokenize,
        )

        arr = pa.array(self.SAMPLES, pa.string())
        lists = pc.split_pattern_regex(pc.utf8_lower(arr), TOKEN_SPLIT_RE)
        batch = [[t for t in row if t] for row in lists.to_pylist()]
        assert batch == [tokenize(s) for s in self.SAMPLES]

    def test_scalar_equals_duckdb(self):
        import duckdb

        from oscar_spatial_index_compare_ray.functions.tokenize import tokenize

        con = duckdb.connect()
        for s in self.SAMPLES:
            got = con.execute(
                "SELECT list_filter(regexp_split_to_array(lower(?), "
                "'[^\\p{L}\\p{N}_]+'), x -> x <> '')",
                [s],
            ).fetchone()[0]
            assert got == tokenize(s), s
