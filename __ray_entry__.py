"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

The spatial pipelines run over a synthetic Common-Crawl-style ``pages``
corpus derived deterministically from the driver's ``documents`` table
(oscar_spatial_index_compare_ray/sources/synth.py).  The oracle SQL
recomputes the same answers independently in DuckDB — including the
point-in-polygon join, done in SQL as a ray-cast parity count over an
exploded polygon-edge table.

No ray.init()/ray.shutdown() here or in the library code (driver owns
the session).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF001 = "/root/testdata/sf0.01"


def _corpus_sql_dir() -> str:
    """The sf0.01 synthetic corpus dir (generated on demand so the
    oracle SQL can read the same parquet the engine reads)."""
    from oscar_spatial_index_compare_ray.sources.synth import ensure_corpus

    return ensure_corpus(SF001)


def entry() -> Any:
    """Flagship: spatial-join + cell-assignment over sf0.001 pages."""
    from oscar_spatial_index_compare_ray.sources.synth import ensure_corpus
    from oscar_spatial_index_compare_ray.pipelines.build_index import build_assignments

    corpus = ensure_corpus("/root/testdata/sf0.001")
    return build_assignments(corpus)


def queries() -> dict[str, Callable[[str], Any]]:
    from oscar_spatial_index_compare_ray.pipelines import queries as q
    from oscar_spatial_index_compare_ray.pipelines import traindata as td

    return {
        "text_stats": td.q_text_stats,
        "lang_id": td.q_lang_id,
        "token_count_by_lang": td.q_token_count_by_lang,
        "fingerprint": td.q_fingerprint,
        "dedup_exact": td.q_dedup_exact,
        "jaccard_pairs": td.q_jaccard_pairs,
        "dedup_minhash": td.q_dedup_minhash,
        "dedup_simhash": td.q_dedup_simhash,
        "dedup_embedding": td.q_dedup_embedding,
        "ann_topk": td.q_ann_topk,
        "ann_lsh": td.q_ann_lsh,
        "events_window": td.q_events_window,
        "sessions": td.q_sessions,
        "multimodal_decode": td.q_multimodal_decode,
        "token_count_bpe": td.q_token_count_bpe,
        "dedup_clusters": td.q_dedup_clusters,
        "dedup_embedding_lsh": td.q_dedup_embedding_lsh,
        "approx_distinct_terms": td.q_approx_distinct_terms,
        "corpus_filter": td.q_corpus_filter,
        "pii_scrub": td.q_pii_scrub,
        "contamination": td.q_contamination,
        "sample_stratified": td.q_sample_stratified,
        "events_asof": td.q_events_asof,
        "events_range_join": td.q_events_range_join,
        "tfidf_top_terms": td.q_tfidf_top_terms,
        "ann_ivf": td.q_ann_ivf,
        "events_hopping": td.q_events_hopping,
        "search_hcqr_union": q.q_search_hcqr_union,
        "extract_points": q.q_extract_points,
        "assign_cells": q.q_assign_cells,
        "assign_simple_pixel": q.q_assign_simple_pixel,
        "doc_counts": q.q_doc_counts,
        "tile_join": q.q_tile_join,
        "knn": q.q_knn,
        "search_exact": q.q_search_exact,
        "search_prefix": q.q_search_prefix,
        "search_suffix": q.q_search_suffix,
        "search_substring": q.q_search_substring,
        "search_union": q.q_search_union,
        "search_intersect": q.q_search_intersect,
        "search_diff": q.q_search_diff,
        "search_symdiff": q.q_search_symdiff,
        "search_nested": q.q_search_nested,
        "search_region": q.q_search_region,
        "search_rect": q.q_search_rect,
        "search_item": q.q_search_item,
        "search_region_payload": q.q_search_region_payload,
        "search_region_payload_s2": q.q_search_region_payload_s2,
        "term_df": q.q_term_df,
        "text_index": q.q_text_index,
    }


def oracle_sql() -> dict[str, str]:
    from oscar_spatial_index_compare_ray.grids import get_grid

    c = _corpus_sql_dir()
    points = f"read_parquet('{c}/points.parquet')"
    edges = f"read_parquet('{c}/region_edges.parquet')"
    tiles = f"read_parquet('{c}/tiles.parquet')"
    simple_expr = get_grid("simple").sql_expr("lat", "lon", 8)

    pip_cell = f"""
      WITH pts AS (SELECT doc_id, point_idx, lat, lon FROM {points}),
      hits AS (
        SELECT p.doc_id, p.point_idx, e.cell_id,
               sum(CASE WHEN ((e.y1 > p.lat) != (e.y2 > p.lat))
                         AND p.lon < (e.x2-e.x1)*(p.lat-e.y1)/(e.y2-e.y1)+e.x1
                    THEN 1 ELSE 0 END) AS crossings
        FROM pts p JOIN {edges} e ON TRUE
        GROUP BY 1, 2, 3),
      assigned AS (
        SELECT p.doc_id, p.point_idx, p.lat, p.lon,
               coalesce(min(CASE WHEN h.crossings % 2 = 1 THEN h.cell_id END), 0) AS cell_id
        FROM pts p LEFT JOIN hits h
          ON h.doc_id = p.doc_id AND h.point_idx = p.point_idx
        GROUP BY 1, 2, 3, 4)
    """

    from oscar_spatial_index_compare_ray.sources.synth import TILE_ID_SQL

    qlat, qlon, k = 48.7758, 9.1829, 25
    hav = (
        f"2 * 6371.0 * asin(sqrt(pow(sin(radians(lat - {qlat}) / 2), 2) "
        f"+ cos(radians({qlat})) * cos(radians(lat)) * pow(sin(radians(lon - {qlon}) / 2), 2)))"
    )

    return {
        "extract_points": f"SELECT doc_id, point_idx, lat, lon FROM {points}",
        "assign_cells": pip_cell + "SELECT doc_id, point_idx, lat, lon, cell_id FROM assigned",
        "assign_simple_pixel": (
            f"SELECT doc_id, point_idx, {simple_expr} AS simple_cell FROM {points}"
        ),
        "doc_counts": pip_cell + (
            "SELECT 'cell' AS level, CAST(cell_id AS BIGINT) AS key, "
            "count(DISTINCT doc_id) AS n_docs FROM assigned GROUP BY 1, 2 "
            "UNION ALL "
            f"SELECT 'pixel' AS level, {simple_expr} AS key, "
            "count(DISTINCT doc_id) AS n_docs FROM pts GROUP BY 1, 2"
        ),
        "tile_join": (
            f"SELECT p.doc_id, p.point_idx, {TILE_ID_SQL} AS tile_id, t.tile_value AS tile_value "
            f"FROM (SELECT doc_id, point_idx, lat, lon FROM {points}) p "
            f"LEFT JOIN {tiles} t ON t.tile_id = {TILE_ID_SQL}"
        ),
        "knn": (
            f"SELECT doc_id, point_idx, lat, lon, round({hav}, 6) AS dist_km "
            f"FROM {points} ORDER BY {hav}, doc_id, point_idx LIMIT {k}"
        ),
        **_search_oracles(c),
        **_traindata_oracles(),
        "term_df": (
            f"SELECT term, count(*) AS df FROM ("
            f"  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}_]+'))) AS term"
            f"  FROM read_parquet('{c}/pages.parquet')"
            f") WHERE term <> '' GROUP BY term"
        ),
        # the FULL stage-B text-index build, recomputed in SQL on the
        # arithmetic-expressible simple grid
        "text_index": (
            f"WITH pts AS (SELECT DISTINCT doc_id, {simple_expr} AS pixel FROM {points}), "
            f"tox AS (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}_]+'))) AS term "
            f"        FROM read_parquet('{c}/pages.parquet')), "
            f"tot AS (SELECT pixel, count(DISTINCT doc_id) AS total FROM pts GROUP BY pixel), "
            f"tp AS (SELECT t.term, p.pixel, count(DISTINCT p.doc_id) AS n "
            f"       FROM tox t JOIN pts p USING (doc_id) WHERE t.term <> '' GROUP BY 1, 2) "
            f"SELECT tp.term, tp.pixel, (tp.n = tot.total) AS fm, tp.n "
            f"FROM tp JOIN tot USING (pixel)"
        ),
    }


def _traindata_oracles() -> dict[str, str]:
    """SQL recomputation of the SQL-expressible training-data operators
    over the pre-registered views (documents / embeddings / events).
    lang_id, fingerprint, dedup_simhash and ann_lsh are deliberately
    absent → rows-only checks (non-SQL-expressible: heuristic models
    and probabilistic sketches); their semantics are pytest-verified
    against exact recomputation instead.

    dedup_minhash DOES get an oracle: at its r=2 × b=32 band geometry
    the LSH candidate recall at j >= τ=0.6 is 1 - (1-τ²)³² ≈ 1-7e-7 —
    deterministic hashes on deterministic data, so the verified output
    equals ALL exact 3-gram-shingle-jaccard pairs >= τ (the SQL below;
    pytest asserts the equality on the test corpora)."""
    toks = "list_filter(list_distinct(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}_]+')), x -> x <> '')"
    all_toks = "list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}_]+'), x -> x <> '')"
    sw = "('the','and','of','to','a','in','is','it','you','that','was','for','on','are','with')"
    # ordered 3-token shingles as strings (mirrors functions/minhash.py
    # shingle_hashes: <3 tokens fold into ONE whole-text shingle)
    shingles = (
        f"CASE WHEN len({all_toks}) < 3 THEN [array_to_string({all_toks}, chr(1))] "
        f"ELSE list_distinct(list_transform(generate_series(1, len({all_toks}) - 2), "
        f"i -> {all_toks}[i] || chr(1) || {all_toks}[i+1] || chr(1) || {all_toks}[i+2])) END"
    )
    url_re = "https?://[^\\s]+"
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    phone_re = "\\+?\\d[\\d\\- ]{7,}\\d"
    return {
        # same pattern strings and replacement ORDER as
        # traindata.PII_PATTERNS (URL -> EMAIL -> PHONE); counts taken
        # per pattern on the ORIGINAL text, like the engine
        "pii_scrub": (
            f"SELECT doc_id, "
            f"regexp_replace(regexp_replace(regexp_replace(text, "
            f"'{url_re}', '<URL>', 'g'), '{email_re}', '<EMAIL>', 'g'), "
            f"'{phone_re}', '<PHONE>', 'g') AS text_clean, "
            f"len(regexp_extract_all(text, '{url_re}')) + "
            f"len(regexp_extract_all(text, '{email_re}')) + "
            f"len(regexp_extract_all(text, '{phone_re}')) AS n_redactions "
            f"FROM documents"
        ),
        # string-shingle mirror of the hash-shingle engine path (hash
        # equality <=> token-sequence equality, the dedup_minhash
        # argument); eval set = doc_id < 50
        "contamination": (
            f"WITH sh AS (SELECT doc_id, unnest({shingles}) AS s FROM documents), "
            f"ev AS (SELECT DISTINCT s FROM sh WHERE doc_id < 50 AND s <> '') "
            f"SELECT d.doc_id, count(*) AS n_shared "
            f"FROM (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id >= 50) d "
            f"JOIN ev USING (s) GROUP BY d.doc_id"
        ),
        # errors joined into the containing user session interval;
        # sessions from NON-error events, gap > 24 h splits (the
        # q_sessions rule at a gap that yields multi-event sessions on
        # this stream); intervals are disjoint per user
        "events_range_join": (
            "WITH ne AS (SELECT user_id, ts, event_id FROM events "
            "  WHERE event_type <> 'error'), "
            "o AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL "
            "  OR ts - lag(ts) OVER w > INTERVAL 24 HOUR THEN 1 ELSE 0 END AS brk "
            "  FROM ne WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id "
            "  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sidx FROM o), "
            "iv AS (SELECT user_id, sidx, min(ts) AS a, max(ts) AS b "
            "  FROM s GROUP BY 1, 2) "
            "SELECT e.event_id, e.user_id, CAST(iv.sidx AS BIGINT) AS session_idx, "
            "epoch_us(iv.a) AS session_start "
            "FROM events e JOIN iv ON e.user_id = iv.user_id "
            "AND e.ts BETWEEN iv.a AND iv.b WHERE e.event_type = 'error'"
        ),
        # purchase <- latest prior click per user; "prior" = earlier
        # (ts, event_id) sort position, exactly the engine's lexsort
        "events_asof": (
            "WITH u AS (SELECT event_id, ts, user_id, event_type, "
            "  CASE WHEN event_type='click' THEN event_id END AS rid, "
            "  CASE WHEN event_type='click' THEN ts END AS rts "
            "  FROM events WHERE event_type IN ('click','purchase')), "
            "o AS (SELECT *, last_value(rid IGNORE NULLS) OVER w AS mid, "
            "  last_value(rts IGNORE NULLS) OVER w AS mts FROM u "
            "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) "
            "SELECT event_id, mid AS matched_id, "
            "round(date_diff('microsecond', mts, ts) / 1e6, 6) AS lag_sec "
            "FROM o WHERE event_type='purchase' AND mid IS NOT NULL"
        ),
        # identical md5-first-byte predicate (portable across engine/SQL)
        "sample_stratified": (
            "SELECT doc_id, source FROM documents "
            "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT < 51"
        ),
        "dedup_minhash": (
            f"WITH s AS (SELECT doc_id, {shingles} AS sh FROM documents) "
            f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            f"round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / "
            f"(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard "
            f"FROM s a JOIN s b ON a.doc_id < b.doc_id "
            f"WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / "
            f"(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6"
        ),
        # connected components of the SAME edge set, as a recursive
        # transitive closure; keeper = component minimum (mirrors the
        # engine's distributed min-label propagation)
        "dedup_clusters": (
            f"WITH RECURSIVE s AS (SELECT doc_id, {shingles} AS sh FROM documents), "
            f"e AS (SELECT a.doc_id AS u, b.doc_id AS v "
            f"      FROM s a JOIN s b ON a.doc_id < b.doc_id "
            f"      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / "
            f"      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6), "
            f"sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e), "
            f"reach(u, v) AS ("
            f"  SELECT u, v FROM sym "
            f"  UNION "
            f"  SELECT r.u, s2.v FROM reach r JOIN sym s2 ON r.v = s2.u) "
            f"SELECT u AS doc_id, least(u, min(v)) AS keeper FROM reach GROUP BY u"
        ),
        # stopword-profile hit rates per language; winner = max score
        # with ties to the lexicographically LARGEST lang (mirrors the
        # engine's max(scores, key=(score, lang))); 'und' when no
        # profile hits.  The stopword lists are generated from the SAME
        # source (functions/textstats.STOPWORDS) to prevent drift.
        "lang_id": _lang_id_sql(all_toks),
        # GPT-2-style pretokens.  RE2 has no lookahead, but the Python
        # pattern's whitespace branches ('\\s+(?!\\S)' | '\\s+') only
        # produce matches the counter EXCLUDES (isspace()), and
        # dropping them does not change which non-whitespace tokens
        # match — verified equal on every corpus doc.
        "token_count_bpe": (
            "SELECT doc_id, len(regexp_extract_all(text, "
            "'''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+'"
            ")) AS n_bpe_tokens FROM documents"
        ),
        "text_stats": (
            f"SELECT doc_id, length(text) AS n_chars, len({all_toks}) AS n_tokens, "
            f"len({toks}) AS n_unique_tokens, "
            f"round(len(list_filter({all_toks}, x -> x IN {sw})) / CAST(len({all_toks}) AS DOUBLE), 6) AS stopword_ratio, "
            f"round(1.0 - len({toks}) / CAST(len({all_toks}) AS DOUBLE), 6) AS repetition_ratio "
            f"FROM documents"
        ),
        "token_count_by_lang": (
            f"SELECT lang, CAST(sum(len({all_toks})) AS BIGINT) AS n_tokens, count(*) AS n_docs "
            f"FROM documents GROUP BY lang"
        ),
        "dedup_exact": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)",
        # fake-codec arithmetic recomputed from md5 bytes (little-endian):
        # height = 16 + (h64 & 63); width = 16 + ((h64>>6) & 63);
        # mean_pixel = (h64>>12) % 256 — only the low 3 md5 bytes matter
        "multimodal_decode": (
            "WITH m AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents), "
            "b AS (SELECT media_id, "
            "  CAST(('0x' || substr(h, 1, 2)) AS BIGINT) AS b0, "
            "  CAST(('0x' || substr(h, 3, 2)) AS BIGINT) AS b1, "
            "  CAST(('0x' || substr(h, 5, 2)) AS BIGINT) AS b2 FROM m) "
            "SELECT media_id, CAST(16 + (b0 % 64) AS INT) AS height, "
            "CAST(16 + ((b0 // 64) + b1 * 4) % 64 AS INT) AS width, "
            "CAST(((b1 // 16) + b2 * 16) % 256 AS DOUBLE) AS mean_pixel FROM b"
        ),
        "jaccard_pairs": (
            f"WITH t AS (SELECT doc_id, {toks} AS tk FROM documents) "
            f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            f"round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) / "
            f"(len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))), 6) AS jaccard "
            f"FROM t a JOIN t b ON a.doc_id < b.doc_id "
            f"WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) / "
            f"(len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) >= 0.4"
        ),
        "dedup_embedding": (
            "WITH e AS (SELECT vec_id, embedding FROM embeddings) "
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine "
            "FROM e a JOIN e b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.45"
        ),
        "ann_topk": (
            "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings "
            "           WHERE vec_id = (SELECT min(vec_id) FROM embeddings)) "
            "SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qe FROM q)), 6) AS cosine "
            "FROM embeddings "
            "ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qe FROM q)) DESC, vec_id "
            "LIMIT 10"
        ),
        "corpus_filter": (
            f"SELECT doc_id FROM ("
            f"  SELECT doc_id, len({all_toks}) AS n_tokens, "
            f"  round(len(list_filter({all_toks}, x -> x IN {sw})) / CAST(len({all_toks}) AS DOUBLE), 6) AS stopword_ratio, "
            f"  round(1.0 - len({toks}) / CAST(len({all_toks}) AS DOUBLE), 6) AS repetition_ratio "
            f"  FROM documents) "
            f"WHERE n_tokens >= 30 AND repetition_ratio < 0.7 AND stopword_ratio >= 0.01"
        ),
        "tfidf_top_terms": (
            f"WITH tok AS (SELECT doc_id, unnest({all_toks}) AS term FROM documents), "
            f"tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2), "
            f"df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term), "
            f"nd AS (SELECT count(*) AS n FROM documents), "
            f"scored AS (SELECT tf.doc_id, tf.term, "
            f"  tf.tf * ln((SELECT n FROM nd) / CAST(df.df AS DOUBLE)) AS s, tf.tf AS tf "
            f"  FROM tf JOIN df USING (term)), "
            f"ranked AS (SELECT doc_id, term, "
            f"  row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, tf DESC, term ASC) AS rank "
            f"  FROM scored) "
            f"SELECT doc_id, term, rank FROM ranked WHERE rank <= 3"
        ),
        "events_window": (
            "SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_s, "
            "event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "events_hopping": (
            "WITH w AS (SELECT CAST(floor(epoch(ts) / 3600) * 3600 - o.o AS BIGINT) AS window_s, "
            "            event_type, value FROM events "
            "            CROSS JOIN (SELECT unnest([0, 3600]) AS o) o "
            "            WHERE epoch(ts) >= floor(epoch(ts) / 3600) * 3600 - o.o "
            "              AND epoch(ts) < floor(epoch(ts) / 3600) * 3600 - o.o + 7200) "
            "SELECT window_s, event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value "
            "FROM w GROUP BY 1, 2"
        ),
        "sessions": (
            "WITH o AS (SELECT user_id, ts, "
            "  CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800 "
            "       THEN 1 ELSE 0 END AS brk "
            "  FROM events) "
            "SELECT user_id, CAST(sum(brk) + 1 AS BIGINT) AS n_sessions, count(*) AS n_events "
            "FROM o GROUP BY user_id"
        ),
    }


def _lang_id_sql(all_toks: str) -> str:
    """SQL mirror of functions/textstats.lang_id: per-language stopword
    hit ratios over ALL tokens, winner by (score, lang) max."""
    from oscar_spatial_index_compare_ray.functions.textstats import STOPWORDS

    score_cols = []
    for lang in sorted(STOPWORDS):
        words = ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lang]))
        score_cols.append(
            f"CASE WHEN len(tk) = 0 THEN 0.0 ELSE "
            f"len(list_filter(tk, x -> x IN ({words}))) / CAST(len(tk) AS DOUBLE) "
            f"END AS s_{lang}"
        )
    langs_desc = sorted(STOPWORDS, reverse=True)  # tie → largest lang wins
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in STOPWORDS) + ")"
    pick = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lg in langs_desc[:-1]:
        pick += f"WHEN s_{lg} = {best} THEN '{lg}' "
    pick += f"ELSE '{langs_desc[-1]}' END"
    return (
        f"WITH t AS (SELECT doc_id, {all_toks} AS tk FROM documents), "
        f"s AS (SELECT doc_id, {', '.join(score_cols)} FROM t) "
        f"SELECT doc_id, {pick} AS lang_pred, "
        f"CASE WHEN {best} = 0 THEN 0.0 ELSE round({best}, 6) END AS lang_conf FROM s"
    )


def _search_oracles(c: str) -> dict[str, str]:
    """Doc-level SQL recomputation of the op-tree searches: a doc is in
    the index iff it has >=1 geotag point; term match = tokenized text
    contains the term; set ops compose with INTERSECT/UNION/EXCEPT."""
    points = f"read_parquet('{c}/points.parquet')"
    pages = f"read_parquet('{c}/pages.parquet')"
    edges = f"read_parquet('{c}/region_edges.parquet')"

    def term(t: str) -> str:
        return (
            f"SELECT DISTINCT doc_id FROM {pages} WHERE "
            f"list_contains(regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}_]+'), '{t}') "
            f"AND doc_id IN (SELECT doc_id FROM {points})"
        )

    def prefix(t: str) -> str:
        return affix(f"{t}%")

    def affix(pattern: str) -> str:
        """Term match by LIKE pattern over the tokenized text — the SQL
        mirror of the suffix/substring/prefix query types."""
        return (
            f"SELECT DISTINCT doc_id FROM {pages} WHERE "
            f"len(list_filter(regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}_]+'), x -> x LIKE '{pattern}')) > 0 "
            f"AND doc_id IN (SELECT doc_id FROM {points})"
        )

    regions_t = f"read_parquet('{c}/regions.parquet')"
    region1 = (
        f"SELECT DISTINCT p.doc_id FROM {points} p JOIN {edges} e ON e.region_id = 1 "
        f"WHERE ((e.y1 > p.lat) != (e.y2 > p.lat)) "
        f"  AND p.lon < (e.x2-e.x1)*(p.lat-e.y1)/(e.y2-e.y1)+e.x1 "
        f"GROUP BY p.doc_id, p.point_idx, e.cell_id "
        f"HAVING count(*) % 2 = 1"
    )
    # region PAYLOAD family: docs inside any region whose NAME matches
    # the prefix (engine: $region:region_00* over family=regions rows)
    region_prefix = (
        f"SELECT DISTINCT p.doc_id FROM {points} p "
        f"JOIN {edges} e ON e.region_id IN "
        f"  (SELECT region_id FROM {regions_t} WHERE starts_with(name, 'region_00')) "
        f"WHERE ((e.y1 > p.lat) != (e.y2 > p.lat)) "
        f"  AND p.lon < (e.x2-e.x1)*(p.lat-e.y1)/(e.y2-e.y1)+e.x1 "
        f"GROUP BY p.doc_id, p.point_idx, e.cell_id "
        f"HAVING count(*) % 2 = 1"
    )
    rect = (
        "SELECT DISTINCT doc_id FROM " + points
        + " WHERE lat BETWEEN 45.0 AND 52.0 AND lon BETWEEN 5.0 AND 15.0"
    )
    a, b, m = term("table"), term("window"), term("merge")
    return {
        "search_exact": f"SELECT doc_id FROM ({a})",
        "search_prefix": f"SELECT doc_id FROM ({prefix('tab')})",
        "search_suffix": f"SELECT doc_id FROM ({affix('%ble')})",
        "search_substring": f"SELECT doc_id FROM ({affix('%abl%')})",
        "search_union": f"({a}) UNION ({b})",
        "search_hcqr_union": f"({a}) UNION ({b})",
        "search_intersect": f"({a}) INTERSECT ({b})",
        "search_diff": f"({a}) EXCEPT ({b})",
        "search_symdiff": f"(({a}) EXCEPT ({b})) UNION (({b}) EXCEPT ({a}))",
        "search_nested": f"(({a}) UNION ({b})) EXCEPT ({m})",
        "search_region": f"(SELECT doc_id FROM ({region1})) INTERSECT ({a})",
        "search_rect": f"({rect}) INTERSECT ({a})",
        # item family == text term match (the mixed domain minus
        # region-name matches; 'table' names no region, so the SQL
        # restricts to the text domain exactly)
        "search_item": f"SELECT doc_id FROM ({a})",
        "search_region_payload": f"SELECT doc_id FROM ({region_prefix})",
        # same SQL, served from a PERSISTED s2-grid index — the
        # cross-grid debugDiff invariant on the file-served path
        "search_region_payload_s2": f"SELECT doc_id FROM ({region_prefix})",
    }
