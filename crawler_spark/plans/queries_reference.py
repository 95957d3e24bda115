"""Reference-surface queries (SURVEY.md §2.1-2.7, §2.9): scans,
filters, aggregations, sort/paginate, string/URL scalars — expressed
over the testdata stand-ins (documents ≈ web_pages text side,
events ≈ jobs stream).

Each maps 1:1 to an operator row in SURVEY.md §2 (cited per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.functions import text as X
from crawler_spark.plans.registry import register
from crawler_spark.sources import load_table

FTS_QUERY = "fast hash join"


# --- S1: projected scan (reference search.py:56) --------------------------
@register(
    "s1_scan_projected",
    oracle="SELECT doc_id, source, lang, n_chars FROM documents",
)
def s1_scan_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )


# --- P1: equality predicate on status (reference search.py:29-36) ---------
@register(
    "p1_filter_eq",
    oracle="""
        SELECT event_id, user_id, value
        FROM events WHERE event_type = 'click'
    """,
)
def p1_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "value")
    )


# --- P2: point lookup by id (reference db.py:113) -------------------------
@register(
    "p2_point_lookup",
    oracle="SELECT doc_id, lang, n_chars FROM documents WHERE doc_id = 42",
)
def p2_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == 42)
        .select("doc_id", "lang", "n_chars")
    )


# --- A1+A2: dashboard totals in one pass (reference search.py:20-44) ------
@register(
    "a1_a2_dashboard_counts",
    oracle="""
        SELECT count(*) AS total_pages,
               count(DISTINCT source) AS total_domains
        FROM documents
    """,
)
def a1_a2_dashboard_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("total_pages"),
        F.countDistinct("source").alias("total_domains"),
    )


# --- A3: filtered counts by status, single pass (search.py:29-36) ---------
@register(
    "a3_counts_by_status",
    oracle="""
        SELECT event_type AS status, count(*) AS n
        FROM events GROUP BY event_type
    """,
)
def a3_counts_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("status"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- A4 + P4: full-text match count (search.py:57-65, 61-62) --------------
@register(
    "a4_fts_match_count",
    oracle="""
        SELECT count(*) AS n_matches FROM documents
        WHERE list_has_all(
            list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> ''),
            ['fast', 'hash', 'join'])
    """,
)
def a4_fts_match_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(X.ts_match("text", FTS_QUERY))
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


# --- P4 as row filter (reference GET /web-pages?query=) -------------------
@register(
    "p4_fts_filter",
    oracle="""
        SELECT doc_id, source FROM documents
        WHERE list_has_all(
            list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> ''),
            ['fast', 'hash', 'join'])
    """,
)
def p4_fts_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(X.ts_match("text", FTS_QUERY))
        .select("doc_id", "source")
    )


# --- P4b: tsquery operator grammar (search.py:63 passes raw tsquery) ------
# AND/OR/NOT + parens + prefix `:*` — precedence ! > & > |, so this is
# (merge & (sort|batch) & !vector) | wind:* ; the oracle spells the same
# boolean token logic in DuckDB list functions.
TSQUERY_GRAMMAR = "merge & (sort | batch) & !vector | wind:*"


@register(
    "p4_fts_grammar",
    oracle="""
        WITH toked AS (
            SELECT doc_id, source,
                   list_filter(string_split_regex(lower(text), '\\W+'),
                               t -> t <> '') AS toks
            FROM documents
        )
        SELECT doc_id, source FROM toked
        WHERE (list_contains(toks, 'merge')
               AND (list_contains(toks, 'sort') OR list_contains(toks, 'batch'))
               AND NOT list_contains(toks, 'vector'))
           OR len(list_filter(toks, t -> starts_with(t, 'wind'))) > 0
    """,
)
def p4_fts_grammar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(X.ts_match_query("text", TSQUERY_GRAMMAR))
        .select("doc_id", "source")
    )


# --- P4c: tsquery phrase operators (search.py:63; Postgres <-> / <N>) -----
# "filt:* <-> hash" = a token starting with "filt" immediately followed
# by "hash"; "merge <2> big" = "big" exactly two positions after
# "merge". The oracle spells the same positional logic with DuckDB
# 1-based list lambdas (out-of-range toks[i+n] is NULL, NULL = 'x' is
# NULL, and list_filter keeps only TRUE — so no bounds guard needed).
TSQUERY_PHRASE = "filt:* <-> hash | merge <2> big"


@register(
    "p4_fts_phrase",
    oracle="""
        WITH toked AS (
            SELECT doc_id, source,
                   list_filter(string_split_regex(lower(text), '\\W+'),
                               t -> t <> '') AS toks
            FROM documents
        )
        SELECT doc_id, source FROM toked
        WHERE len(list_filter(range(1, len(toks) + 1), i ->
                  starts_with(toks[i], 'filt') AND toks[i+1] = 'hash')) > 0
           OR len(list_filter(range(1, len(toks) + 1), i ->
                  toks[i] = 'merge' AND toks[i+2] = 'big')) > 0
    """,
)
def p4_fts_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(X.ts_match_query("text", TSQUERY_PHRASE))
        .select("doc_id", "source")
    )


# --- O1: dynamic sort + paginate (search.py:68, main.py:93-101) -----------
@register(
    "o1_sort_paginate",
    oracle="""
        SELECT doc_id, source, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT 10 OFFSET 5
    """,
)
def o1_sort_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .offset(5)
        .limit(10)
    )


# --- O2: recency page (db.py:122) -----------------------------------------
@register(
    "o2_recency_page",
    oracle="""
        SELECT event_id, ts, event_type FROM events
        ORDER BY ts DESC, event_id LIMIT 20
    """,
)
def o2_recency_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type")
        .orderBy(F.col("ts").desc(), F.col("event_id").asc())
        .limit(20)
    )


# --- F1: domain extraction (db.py:60) + group count -----------------------
@register(
    "f1_domain_counts",
    oracle="""
        SELECT regexp_extract('https://' || source || '.example.com/p/' || doc_id,
                              'https?://([^/]+)', 1) AS domain,
               count(*) AS n
        FROM documents GROUP BY 1
    """,
)
def f1_domain_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/p/"),
                   F.col("doc_id").cast("string"))
    return (
        docs.select(F.parse_url(url, F.lit("HOST")).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- A5: RAG context string aggregation (search.py:128-130) ---------------
@register(
    "a5_rag_context",
    oracle="""
        SELECT lang,
               string_agg('URL: ' || source || chr(10) || 'Content: ' ||
                          substr(text, 1, 40),
                          chr(10) || chr(10) ORDER BY doc_id) AS context
        FROM documents GROUP BY lang
    """,
)
def a5_rag_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    entry = F.struct(
        F.col("doc_id"),
        F.concat(F.lit("URL: "), F.col("source"), F.lit("\nContent: "),
                 F.substring("text", 1, 40)).alias("line"),
    )
    return (
        docs.groupBy("lang")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(entry)), lambda s: s["line"]),
                "\n\n",
            ).alias("context")
        )
    )
