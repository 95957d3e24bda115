"""Search-API parity queries (SURVEY.md §2.13, §2.9 F3/F10-F11): the
reference's POST /search pipeline end-to-end, snippet extraction, and
structured-data extraction through from_json — all under the DuckDB
value-level oracle (the extraction stub is a pure function of content,
mirrored 1:1 in SQL).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.functions import text as X
from crawler_spark.functions.extraction import extract_udf, parse_structured
from crawler_spark.plans.queries_vector import _NORM_V_SQL, _QV_SQL, QUERY_TEXT
from crawler_spark.plans.oracle_pins import pin_kwargs as _PINS_KW
from crawler_spark.plans.registry import register
from crawler_spark.sources import load_table

_SNIPPET_QUERY = "fast hash join"


def _snippet_sql(text_col: str, query: str, max_len: int = 200) -> str:
    """DuckDB twin of functions.text.snippet (reference search.py:102-112)."""
    half = max_len // 2
    terms = [t for t in re.findall(r"\w+", query.lower()) if t]
    pos = "coalesce(" + ", ".join(
        f"nullif(strpos(lower({text_col}), '{t}'), 0)" for t in terms
    ) + ")"
    return f"""
        CASE WHEN {pos} IS NOT NULL
             THEN '... ' || trim(substr({text_col}, greatest({pos} - {half}, 1), {max_len}))
                      || ' ...'
             ELSE substr({text_col}, 1, {max_len}) || '...'
        END
    """


# --- F3: snippet extraction over every document ---------------------------
@register(
    "f3_snippet",
    oracle=f"""
        SELECT doc_id, {_snippet_sql('text', _SNIPPET_QUERY)} AS snippet
        FROM documents
    """,
)
def f3_snippet(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", X.snippet("text", _SNIPPET_QUERY).alias("snippet"))


# --- F11: structured extraction (stub LLM → from_json → fields) -----------
@register(
    "f11_extract_ecommerce",
    oracle="""
        SELECT doc_id,
               'product-' || substr(md5(text), 1, 8) AS product_name,
               (length(text) * 7 % 9000) / 100.0 + 10.0 AS price,
               'USD' AS currency,
               upper(substr(md5(text), 9, 8)) AS sku,
               substr(text, 1, 40) AS description,
               (['electronics','clothing','home','sports','books'])[length(text) % 5 + 1]
                   AS category
        FROM documents
    """,
)
def f11_extract_ecommerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real pipeline path: extraction UDF emits a JSON string,
    from_json parses it against the declared StructType, fields
    projected out (reference structured_data.py:57-109)."""
    docs = load_table(spark, sf_dir, "documents")
    parsed = parse_structured(extract_udf("ecommerce")(F.col("text")), "ecommerce")
    return docs.select("doc_id", parsed.alias("sd")).select(
        "doc_id", "sd.product_name", "sd.price", "sd.currency",
        "sd.sku", "sd.description", "sd.category",
    )


@register(
    "f11_extract_blog",
    oracle="""
        SELECT doc_id,
               'post-' || substr(md5(text), 1, 8) AS post_title,
               'author-' || substr(md5(text), 9, 4) AS author,
               '20' || lpad(CAST(length(text) % 25 AS VARCHAR), 2, '0') || '-01-01'
                   AS publication_date,
               substr(text, 1, 40) AS summary
        FROM documents
    """,
)
def f11_extract_blog(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    parsed = parse_structured(extract_udf("blog")(F.col("text")), "blog")
    return docs.select("doc_id", parsed.alias("sd")).select(
        "doc_id", "sd.post_title", "sd.author", "sd.publication_date", "sd.summary"
    )


# --- F11 through the ingest path, flag-gated (reference tasks.py:92) ------
@register(
    "f11_extract_ingest",
    oracle="""
        SELECT 'https://' || source || '/d/' || CAST(doc_id AS VARCHAR) AS url,
               'product-' || substr(md5(text), 1, 8) AS product_name,
               (length(text) * 7 % 9000) / 100.0 + 10.0 AS price,
               'USD' AS currency,
               upper(substr(md5(text), 9, 8)) AS sku,
               substr(text, 1, 40) AS description,
               (['electronics','clothing','home','sports','books'])[length(text) % 5 + 1]
                   AS category
        FROM documents
    """,
)
def f11_extract_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 wired where the reference runs it — inside ingest, behind the
    ``structured_data_extraction`` flag (tasks.py:92): PAGE_ITEM rows
    built from documents run embed→finalize with the flag ON; the
    stored JSON string is parsed back out, so the flag wiring sits
    under the value-level oracle end-to-end."""
    from crawler_spark import schemas as S
    from crawler_spark.plans.ingest import embed_stage, finalize_pages

    docs = load_table(spark, sf_dir, "documents")
    items = docs.select(
        F.concat(F.lit("https://"), "source", F.lit("/d/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("meta_description"),
        F.lit(None).cast("map<string,string>").alias("meta_tags"),
        F.col("text").alias("content"),
        F.lit("html").alias("file_type"),
        F.lit("text").alias("embedding_type"),
        F.lit(None).cast("array<string>").alias("links"),
        F.lit(None).cast("string").alias("error"),
    )
    flags = spark.createDataFrame(
        [(1, "structured_data_extraction", True, "enabled for this query")],
        S.FEATURE_FLAGS,
    )
    pages = finalize_pages(embed_stage(items), flags=flags)
    sd = parse_structured(F.col("structured_data"), "ecommerce")
    return pages.select("url", sd.alias("sd")).select(
        "url", "sd.product_name", "sd.price", "sd.currency", "sd.sku",
        "sd.description", "sd.category",
    )


# --- §2.13 POST /search end-to-end ---------------------------------------
@register(
    "search_api_semantic",
    oracle=f"""
        WITH knn AS (
            SELECT vec_id, distance FROM (
                SELECT vec_id,
                       -list_dot_product({_NORM_V_SQL}, {_QV_SQL}) AS distance
                FROM embeddings
            ) WHERE distance <= 1.0
            ORDER BY distance, vec_id LIMIT 5
        )
        SELECT d.doc_id, round(k.distance, 6) AS distance,
               d.source AS url,
               {_snippet_sql('d.text', QUERY_TEXT)} AS snippet
        FROM documents d JOIN knn k ON d.doc_id = k.vec_id
    """,
)
def search_api_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full semantic search pipeline: stub-embed the query text,
    normalize+pad, exact k-NN, broadcast-join document text, snippet —
    the flagship entry() with the distance rounded for the oracle."""
    from crawler_spark.plans.search_api import semantic_search

    hits = semantic_search(spark, sf_dir, QUERY_TEXT, k=5, similarity_threshold=0.0)
    return hits.select(
        "doc_id", F.round("distance", 6).alias("distance"), "url", "snippet"
    )


# --- §2.13 GET /dashboard-analytics facade --------------------------------
@register(
    "dashboard_analytics",
    oracle="""
        SELECT (SELECT count(*) FROM documents) AS total_pages,
               (SELECT count(DISTINCT source) FROM documents) AS total_domains,
               (SELECT count(*) FROM events WHERE event_type = 'view') AS running_jobs,
               (SELECT count(*) FROM events WHERE event_type = 'purchase')
                   AS completed_jobs
    """,
)
def dashboard_analytics_facade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's four independent dashboard queries
    (search.py:20-44) as one facade call — under the value-level gate
    so the whole §2.13 HTTP surface is oracle-backed."""
    from crawler_spark.plans.search_api import dashboard_analytics

    return dashboard_analytics(spark, sf_dir)


# --- §2.13 GET /web-pages facade (filter + sort + paginate) ---------------
@register(
    "web_pages_listing",
    oracle="""
        SELECT doc_id, source, lang, n_chars FROM documents
        WHERE list_has_all(
            list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> ''),
            ['data'])
        ORDER BY n_chars DESC, doc_id ASC LIMIT 10 OFFSET 5
    """,
)
def web_pages_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /web-pages with every knob exercised at once: FTS filter
    (P4), dynamic sort column/direction (O1), offset pagination, and
    the doc_id tie-break that makes pages deterministic."""
    from crawler_spark.plans.search_api import web_pages

    return web_pages(
        spark, sf_dir, limit=10, offset=5,
        sort_by="n_chars", sort_order="desc", query="data",
    )


# --- §2.13 POST /api/chat: RAG retrieval + context + stub answer ----------
@register(
    "rag_chat_pipeline",
    # Generation is out-of-engine, but the STUB answer is a pure
    # function of the prompt (md5 digest), and the prompt is a pure
    # function of the retrieved context — so the whole D10 pipeline is
    # table-derived: DuckDB re-runs retrieval (same knn fragment as
    # search_api_semantic), reassembles the context blocks in
    # (distance, doc_id) order, rebuilds the prompt template, and
    # recomputes the digest. A drifted retrieval, block order, or
    # template is a hash mismatch.
    oracle=f"""
        WITH knn AS (
            SELECT vec_id, distance FROM (
                SELECT vec_id,
                       -list_dot_product({_NORM_V_SQL}, {_QV_SQL}) AS distance
                FROM embeddings
            ) WHERE distance <= 1.0
            ORDER BY distance, vec_id LIMIT 5
        ),
        hits AS (
            SELECT k.distance, d.doc_id,
                   'URL: ' || d.source || chr(10) || 'Content: '
                       || {_snippet_sql('d.text', QUERY_TEXT)} AS block
            FROM documents d JOIN knn k ON d.doc_id = k.vec_id
        ),
        ctx AS (
            SELECT string_agg(block, chr(10) || chr(10)
                              ORDER BY distance, doc_id) AS context
            FROM hits
        ),
        p AS (
            SELECT context,
                   'Answer using only the context below.' || chr(10)
                       || chr(10) || 'Context:' || chr(10) || context
                       || chr(10) || chr(10)
                       || 'Question: {QUERY_TEXT}' || chr(10) || 'Answer:'
                       AS prompt
            FROM ctx
        )
        SELECT '{QUERY_TEXT}' AS question, context, prompt,
               'stub-answer-' || substr(md5(prompt), 1, 12) AS answer
        FROM p
    """,
)
def rag_chat_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crawler_spark.plans.search_api import rag_chat

    return rag_chat(spark, sf_dir, QUERY_TEXT, k=5)


# --- hybrid retrieval: reciprocal-rank fusion of keyword + vector ---------
_RRF_K = 60
_RRF_CAND = 50
_RRF_TOP = 10
_RRF_TERMS = [t for t in re.findall(r"\w+", QUERY_TEXT.lower()) if t]


@register(
    "search_hybrid_rrf",
    oracle=f"""
        WITH text_cand AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY match_cnt DESC, doc_id)
                       AS text_rank
            FROM (
                SELECT doc_id,
                       len(list_intersect(
                           list_distinct(list_filter(
                               string_split_regex(lower(text), '\\W+'),
                               t -> t <> '')),
                           [{", ".join(repr(t) for t in _RRF_TERMS)}]))
                           AS match_cnt
                FROM documents
            ) WHERE match_cnt >= 1
            ORDER BY match_cnt DESC, doc_id LIMIT {_RRF_CAND}
        ),
        vec_cand AS (
            SELECT vec_id AS doc_id,
                   row_number() OVER (ORDER BY distance, vec_id) AS vec_rank
            FROM (
                SELECT vec_id,
                       -list_dot_product({_NORM_V_SQL}, {_QV_SQL}) AS distance
                FROM embeddings
            ) ORDER BY distance, doc_id LIMIT {_RRF_CAND}
        )
        SELECT doc_id,
               CAST(coalesce(text_rank, 0) AS BIGINT) AS text_rank,
               CAST(coalesce(vec_rank, 0) AS BIGINT) AS vec_rank,
               round(coalesce(1.0 / ({_RRF_K} + text_rank), 0)
                     + coalesce(1.0 / ({_RRF_K} + vec_rank), 0), 6) AS rrf
        FROM text_cand FULL OUTER JOIN vec_cand USING (doc_id)
        ORDER BY rrf DESC, doc_id LIMIT {_RRF_TOP}
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search by reciprocal-rank fusion (Cormack et al., SIGIR
    2009): the keyword retriever and the vector retriever each produce
    a top-{cand} candidate list via TakeOrderedAndProject (scale-safe —
    no global rank over the corpus), ranks are assigned on those tiny
    lists (a {cand}-row single-partition window, not a corpus window),
    and RRF = Σ 1/(k + rank) fuses them with a full outer join so a doc
    found by only one retriever still scores. The serving shape of
    every hybrid RAG stack; both retrievers already exist in the repo
    (P4 keyword filter, O3 vector top-k)."""
    from crawler_spark.plans.queries_vector import QUERY_VEC
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    match_cnt = F.size(F.array_intersect(
        F.array_distinct(X.tokenize("text")),
        F.array(*[F.lit(t) for t in _RRF_TERMS])))
    text_cand = (
        docs.select("doc_id", match_cnt.alias("match_cnt"))
        .where(F.col("match_cnt") >= 1)
        .orderBy(F.col("match_cnt").desc(), "doc_id")
        .limit(_RRF_CAND)
        .withColumn("text_rank", F.row_number().over(
            Window.orderBy(F.col("match_cnt").desc(), "doc_id")))
        .select("doc_id", "text_rank")
    )
    from crawler_spark.functions import vector as V

    dist = V.neg_dot(V.l2_normalize("embedding"), V.vector_lit(QUERY_VEC))
    vec_cand = (
        emb.select(F.col("vec_id").alias("doc_id"), dist.alias("distance"))
        .orderBy("distance", "doc_id")
        .limit(_RRF_CAND)
        .withColumn("vec_rank", F.row_number().over(
            Window.orderBy("distance", "doc_id")))
        .select("doc_id", "vec_rank")
    )
    rrf = F.round(
        F.coalesce(1.0 / (_RRF_K + F.col("text_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (_RRF_K + F.col("vec_rank")), F.lit(0.0)), 6)
    return (
        text_cand.join(vec_cand, "doc_id", "full_outer")
        .select(
            "doc_id",
            # rank 0 = "not retrieved by this side": keeps the column
            # integral through both engines' pandas bridges (a nullable
            # int comes back float64+NaN and breaks the value hash)
            F.coalesce("text_rank", F.lit(0)).cast("long").alias("text_rank"),
            F.coalesce("vec_rank", F.lit(0)).cast("long").alias("vec_rank"),
            rrf.alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(_RRF_TOP)
    )


# --- MMR diversified re-rank (greedy selection is iterative, not
# SQL-expressible — VALUES pin at the driver's sf0.01, derived by an
# INDEPENDENT pure-python retrieval + greedy reference over the raw
# parquet, tools/pin_oracles.py; also value-tested against a python
# reference in tests/test_search_api.py) -------------------------------
@register(
    "search_mmr_rerank",
    **_PINS_KW("search_mmr_rerank"),
)
def search_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relevance retrieval → MMR diversity re-rank: top-30 candidates
    by exact cosine (TakeOrderedAndProject, swap in any ANN tier at
    scale), then the bounded greedy pick of 10 (Carbonell & Goldstein
    1998). The rerank stage every production RAG pipeline runs between
    retrieval and the context window."""
    from crawler_spark.operators.similarity import mmr_rerank
    from crawler_spark.plans.queries_vector import QUERY_VEC

    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_rerank(emb, QUERY_VEC, k=10, fetch_k=30, lam=0.7)


# --- BM25 lexical ranking (Robertson & Zaragoza 2009) ----------------------
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 10


def _bm25_oracle(terms: list[str], k1: float, b: float, top: int) -> str:
    toks = ("list_filter(string_split_regex(lower(text), '\\W+'), "
            "t -> t <> '')")
    tf_cols = ", ".join(
        f"len(list_filter(toks, t -> t = {t!r})) AS tf{i}"
        for i, t in enumerate(terms))
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms)))
    score = " + ".join(
        f"ln((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1.0)"
        f" * tf{i} / (tf{i} + {k1} * (1 - {b} + {b} * dl / avgdl))"
        for i in range(len(terms)))
    return f"""
        WITH m AS (
            SELECT doc_id, len(toks) AS dl, {tf_cols}
            FROM (SELECT doc_id, {toks} AS toks FROM documents
                  WHERE text IS NOT NULL)
        ),
        s AS (
            SELECT count(*) AS n_docs, avg(dl) AS avgdl, {df_cols} FROM m
        )
        SELECT doc_id, bm25 FROM (
            SELECT doc_id, round({score}, 6) AS bm25 FROM m, s
        ) WHERE bm25 > 0
        ORDER BY bm25 DESC, doc_id LIMIT {top}
    """


@register(
    "search_bm25_topk",
    oracle=_bm25_oracle(_RRF_TERMS, _BM25_K1, _BM25_B, _BM25_TOP),
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k over the documents table — the lexical ranker the
    reference's ILIKE/FTS search (search.py:63-87) upgrades to at
    scale, and the standard keyword side of a hybrid RAG stack (pair
    with `search_hybrid_rrf`).

    Scale story: per-doc term frequencies and doc length come from ONE
    bound tokenize per row (pure projection, no shuffle — the query
    term list is a static literal); corpus stats (N, avgdl, per-term
    df) reduce to a single 1-row aggregate broadcast back with a
    crossJoin; the final ranking is TakeOrderedAndProject. Total cost
    at 100 TB: two scans (the stats-aggregate pass, then the scoring
    pass — plan-locked) — no corpus-sized shuffle, no join on doc_id;
    a serving deployment precomputes (N, avgdl, df) as a maintained
    stats table, leaving a single scan per query."""
    return (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_BM25_TOP)
    )


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for every document with a positive score — the
    shared scoring frame behind `search_bm25_topk` and the lexical arm
    of `search_hybrid_bm25`."""
    # NULL text excluded in BOTH engines: unguarded, Spark's legacy
    # sizeOfNull turns dl/tf into -1 (a positive garbage score) while
    # DuckDB's NULL score row silently drops — an oracle split and a
    # polluted avgdl the moment the corpus holds a NULL document
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull())
    terms = _RRF_TERMS
    idx = range(len(terms))

    m = docs.select(
        "doc_id",
        X.bind_once(
            X.tokenize("text"),
            lambda toks: F.struct(
                F.size(toks).alias("dl"),
                *[F.size(F.filter(toks, lambda t: t == F.lit(q)))
                  .alias(f"tf{i}") for i, q in enumerate(terms)],
            ),
        ).alias("m"),
    ).select("doc_id", "m.dl", *[f"m.tf{i}" for i in idx])

    stats = m.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
          for i in idx],
    )

    norm = _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    score = sum(
        (F.log((F.col("n_docs") - F.col(f"df{i}") + 0.5)
               / (F.col(f"df{i}") + 0.5) + 1.0)
         * F.col(f"tf{i}") / (F.col(f"tf{i}") + norm))
        for i in idx
    )
    return (
        m.crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(score, 6).alias("bm25"))
        .where(F.col("bm25") > 0)
    )


# --- hybrid retrieval, BM25 arm: RRF over BM25 + vector ranks --------------
def _bm25_cand_sql(terms: list[str], k1: float, b: float, cand: int) -> str:
    """The BM25 oracle reshaped into a rank-assigning candidate CTE."""
    body = _bm25_oracle(terms, k1, b, cand)
    # strip the trailing ORDER/LIMIT select into a ranked candidate list
    return f"""
        SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS text_rank
        FROM ({body})
    """


@register(
    "search_hybrid_bm25",
    oracle=f"""
        WITH text_cand AS ({_bm25_cand_sql(_RRF_TERMS, _BM25_K1, _BM25_B,
                                           _RRF_CAND)}),
        vec_cand AS (
            SELECT vec_id AS doc_id,
                   row_number() OVER (ORDER BY distance, vec_id) AS vec_rank
            FROM (
                SELECT vec_id,
                       -list_dot_product({_NORM_V_SQL}, {_QV_SQL}) AS distance
                FROM embeddings
            ) ORDER BY distance, doc_id LIMIT {_RRF_CAND}
        )
        SELECT doc_id,
               CAST(coalesce(text_rank, 0) AS BIGINT) AS text_rank,
               CAST(coalesce(vec_rank, 0) AS BIGINT) AS vec_rank,
               round(coalesce(1.0 / ({_RRF_K} + text_rank), 0)
                     + coalesce(1.0 / ({_RRF_K} + vec_rank), 0), 6) AS rrf
        FROM text_cand FULL OUTER JOIN vec_cand USING (doc_id)
        ORDER BY rrf DESC, doc_id LIMIT {_RRF_TOP}
    """,
)
def search_hybrid_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`search_hybrid_rrf` with the production-default lexical arm:
    BM25 candidates (idf-weighted, length-normalized) instead of raw
    match counts, fused with the vector retriever by reciprocal-rank
    fusion. Same scale shape as both parents — the BM25 arm is two
    scans + a 1-row stats broadcast ending in TakeOrderedAndProject,
    the vector arm is TakeOrderedAndProject, and RRF joins two
    {cand}-row lists; ranks are assigned on the bounded candidate
    lists, never as a corpus-wide window."""
    from pyspark.sql import Window

    from crawler_spark.functions import vector as V
    from crawler_spark.plans.queries_vector import QUERY_VEC

    text_cand = (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_RRF_CAND)
        .withColumn("text_rank", F.row_number().over(
            Window.orderBy(F.col("bm25").desc(), "doc_id")))
        .select("doc_id", "text_rank")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    dist = V.neg_dot(V.l2_normalize("embedding"), V.vector_lit(QUERY_VEC))
    vec_cand = (
        emb.select(F.col("vec_id").alias("doc_id"), dist.alias("distance"))
        .orderBy("distance", "doc_id")
        .limit(_RRF_CAND)
        .withColumn("vec_rank", F.row_number().over(
            Window.orderBy("distance", "doc_id")))
        .select("doc_id", "vec_rank")
    )
    rrf = F.round(
        F.coalesce(1.0 / (_RRF_K + F.col("text_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (_RRF_K + F.col("vec_rank")), F.lit(0.0)), 6)
    return (
        text_cand.join(vec_cand, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("text_rank", F.lit(0)).cast("long").alias("text_rank"),
            F.coalesce("vec_rank", F.lit(0)).cast("long").alias("vec_rank"),
            rrf.alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(_RRF_TOP)
    )
