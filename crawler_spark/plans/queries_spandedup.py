"""Cross-document duplicated-span queries (the Lee et al. 2022
exact-substring dedup tier) — sliding positional k-grams at arbitrary
alignment, merged into maximal spans, plus the keep-first-wins corpus
rewrite. Complements ``dedup_repeated_spans`` (block-aligned windows,
queries_curation.py) — a duplicate shifted by one token escapes fixed
blocks but not a sliding gram.

Both queries are fully SQL-expressible, so both sit under the DuckDB
value-level oracle: the oracle groups grams by their k-word STRING
while Spark groups by xxhash64 of that string — identical answers
modulo a 2^-64 collision (see operators/spans.py for why hashing is
the right call at 100 TB and why the error direction is acceptable
for this tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from crawler_spark.operators.spans import (
    crossdoc_duplicate_spans,
    remove_crossdoc_spans,
)
from crawler_spark.plans.registry import register
from crawler_spark.sources import load_table

_TOKENS_SQL = "list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')"
_K = 8

# Shared oracle prefix: positional k-grams (0-based pos to match
# Spark), grams held by >= 2 documents with their lowest-id keeper,
# and the gaps-and-islands merge of hit positions into maximal spans.
# DuckDB list slicing tk[i:i+7] is 1-based inclusive → 8 elements.
def _spans_cte(keep_first: bool) -> str:
    hit_filter = "WHERE gr.doc_id > d.keeper" if keep_first else ""
    return f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS_SQL} AS tk FROM documents
        ),
        grams AS (
            SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
                   array_to_string(tk[u.i:u.i+{_K - 1}], ' ') AS g
            FROM toks,
                 unnest(generate_series(1, greatest(len(tk) - {_K - 1}, 0)))
                     AS u(i)
        ),
        dup AS (
            SELECT g, min(doc_id) AS keeper FROM grams
            GROUP BY g HAVING count(DISTINCT doc_id) >= 2
        ),
        hits AS (
            SELECT gr.doc_id, gr.pos
            FROM grams gr JOIN dup d USING (g) {hit_filter}
        ),
        lagged AS (
            SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM hits
        ),
        isl AS (
            SELECT doc_id, pos,
                   sum(CASE WHEN prev IS NULL OR pos - prev > {_K}
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM lagged
        ),
        spans AS (
            SELECT doc_id,
                   min(pos) AS span_start,
                   max(pos) + {_K - 1} AS span_end,
                   max(pos) + {_K} - min(pos) AS span_tokens
            FROM isl GROUP BY doc_id, island
        )
    """


@register(
    "dedup_crossdoc_spans",
    oracle=_spans_cte(keep_first=False)
    + "SELECT doc_id, span_start, span_end, span_tokens FROM spans",
)
def dedup_crossdoc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagnostic view: every maximal >= 8-token span shared verbatim
    by >= 2 documents, reported for ALL holders."""
    docs = load_table(spark, sf_dir, "documents")
    return crossdoc_duplicate_spans(docs, k=_K)


@register(
    "dedup_crossdoc_removal",
    oracle=_spans_cte(keep_first=True)
    + f"""
        , drops AS (
            SELECT doc_id, list(CAST(v.p AS BIGINT) ORDER BY v.p) AS drop
            FROM spans, unnest(generate_series(span_start, span_end)) AS v(p)
            GROUP BY doc_id
        )
        SELECT t.doc_id,
               -- coalesce: DuckDB's array_to_string returns NULL for an
               -- empty list (fully-removed doc); Spark's concat_ws gives ''
               coalesce(array_to_string(
                   list_filter(tk, (x, i) -> NOT list_contains(
                       coalesce(drop, CAST([] AS BIGINT[])),
                       CAST(i - 1 AS BIGINT))),
                   ' '), '') AS clean_text,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               CAST(len(tk) - len(list_filter(tk, (x, i) -> NOT list_contains(
                       coalesce(drop, CAST([] AS BIGINT[])),
                       CAST(i - 1 AS BIGINT)))) AS BIGINT) AS n_removed
        FROM toks t LEFT JOIN drops USING (doc_id)
    """,
)
def dedup_crossdoc_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The destructive rewrite: the lowest-id holder keeps each shared
    span, every later holder loses it — content survives exactly once
    corpus-wide. Docs untouched by any span pass through (in the
    tokenizer's canonical whitespace, applied uniformly)."""
    docs = load_table(spark, sf_dir, "documents")
    return remove_crossdoc_spans(docs, k=_K)


_KEY_SQL = "md5(CAST(doc_id AS VARCHAR))"


@register(
    "dedup_crossdoc_incremental",
    oracle=f"""
        WITH batch AS (
            SELECT doc_id, text FROM documents
            WHERE substr({_KEY_SQL}, 1, 2) < '1a'
        ),
        corpus AS (
            SELECT doc_id, text FROM documents
            WHERE substr({_KEY_SQL}, 1, 2) >= '1a'
        ),
        bg AS (
            SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
                   array_to_string(tk[u.i:u.i+{_K - 1}], ' ') AS g
            FROM (SELECT doc_id, {_TOKENS_SQL} AS tk FROM batch),
                 unnest(generate_series(1, greatest(len(tk) - {_K - 1}, 0)))
                     AS u(i)
        ),
        cg AS (
            SELECT DISTINCT array_to_string(tk[u.i:u.i+{_K - 1}], ' ') AS g
            FROM (SELECT doc_id, {_TOKENS_SQL} AS tk FROM corpus),
                 unnest(generate_series(1, greatest(len(tk) - {_K - 1}, 0)))
                     AS u(i)
        ),
        hits AS (SELECT DISTINCT bg.doc_id, bg.pos FROM bg JOIN cg USING (g)),
        lagged AS (
            SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM hits
        ),
        isl AS (
            SELECT doc_id, pos,
                   sum(CASE WHEN prev IS NULL OR pos - prev > {_K}
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM lagged
        )
        SELECT doc_id,
               min(pos) AS span_start,
               max(pos) + {_K - 1} AS span_end,
               max(pos) + {_K} - min(pos) AS span_tokens
        FROM isl GROUP BY doc_id, island
    """,
)
def dedup_crossdoc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-crawl form of span dedup: a small new batch
    (deterministic ~10% hash split, the same split convention as
    ``dedup_incremental``) reports every span it shares with the
    EXISTING corpus — batch grams broadcast, corpus streams map-side
    with no corpus shuffle. The corpus keeps its text by definition."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.spans import crossdoc_spans_vs_corpus

    docs = load_table(spark, sf_dir, "documents")
    key2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return crossdoc_spans_vs_corpus(
        docs.filter(key2 < "1a"), docs.filter(key2 >= "1a"), k=_K
    )
