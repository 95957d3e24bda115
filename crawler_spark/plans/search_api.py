"""Composed query plans mirroring the reference's HTTP query surface
(reference backend/src/main.py routes → SURVEY.md §2.13).

Each function is one declarative DataFrame plan; Catalyst handles
pushdown/pruning/top-k. The only Python-side work is building the
query vector (a scalar, reference does the same driver-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.functions import text as X
from crawler_spark.functions.embedding import DEFAULT_DIMS, StubEmbedder, normalize_pad
from crawler_spark.operators.similarity import knn_topk
from crawler_spark.sources import load_table


def semantic_search(
    spark: SparkSession,
    sf_dir: str,
    query: str,
    k: int = 5,
    similarity_threshold: float = 0.95,
    embedder: StubEmbedder | None = None,
    dims: int = DEFAULT_DIMS,
) -> DataFrame:
    """``POST /search``: embed query → normalize+pad → k-NN over the
    vector table → join document text → snippet per hit
    (reference backend/src/search.py:77-99, db.py:78-87).

    The k-row top-k result is broadcast into the join with documents,
    so the document table is never shuffled.
    """
    emb = embedder or StubEmbedder(dims)
    qvec = normalize_pad(emb.embed_text(query), dims)
    max_distance = 1.0 - similarity_threshold

    vectors = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")

    top = knn_topk(vectors, qvec, k=k, max_distance=max_distance)
    return (
        docs.join(F.broadcast(top), docs.doc_id == top.vec_id, "inner")
        .select(
            "doc_id",
            "distance",
            F.col("source").alias("url"),
            X.snippet("text", query).alias("snippet"),
        )
        .orderBy("distance", "doc_id")
    )


def rag_chat(
    spark: SparkSession,
    sf_dir: str,
    question: str,
    k: int = 5,
    flags: DataFrame | None = None,
) -> DataFrame:
    """``POST /api/chat`` (D10, reference search.py:115-170): retrieve
    top-k context by semantic search, assemble the RAG prompt (A5 + F10
    — "URL: ...\\nContent: ..." blocks joined by blank lines, ordered by
    relevance), and produce an answer. Generation is out-of-engine (the
    reference streams from Ollama); the stub answer is a deterministic
    digest of the prompt so the pipeline is hermetically testable.

    Flag-gated by ``chat_ui`` exactly like the reference (main.py:222):
    disabled ⇒ empty result with the same schema.
    """
    from crawler_spark.plans.jobs import is_feature_enabled

    out_schema = "question string, context string, prompt string, answer string"
    if flags is not None and not is_feature_enabled(flags, "chat_ui"):
        return spark.createDataFrame([], out_schema)

    hits = semantic_search(spark, sf_dir, question, k=k, similarity_threshold=0.0)
    entry = F.struct(
        "distance", "doc_id",
        F.concat(F.lit("URL: "), F.col("url"), F.lit("\nContent: "),
                 F.col("snippet")).alias("block"),
    )
    ctx = hits.agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(entry)), lambda s: s["block"]),
            "\n\n",
        ).alias("context")
    )
    prompt = F.concat(
        F.lit("Answer using only the context below.\n\nContext:\n"),
        F.col("context"),
        F.lit(f"\n\nQuestion: {question}\nAnswer:"),
    )
    return ctx.select(
        F.lit(question).alias("question"),
        "context",
        prompt.alias("prompt"),
        F.concat(F.lit("stub-answer-"), F.substring(F.md5(prompt), 1, 12)).alias("answer"),
    )


def dashboard_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GET /dashboard-analytics``: total pages, distinct domains, and
    status-filtered job counts, as ONE single-pass aggregate rather than
    the reference's four independent queries (search.py:20-44)."""
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")
    doc_agg = docs.agg(
        F.count(F.lit(1)).alias("total_pages"),
        F.countDistinct("source").alias("total_domains"),
    )
    ev_agg = events.agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("running_jobs"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("completed_jobs"),
    )
    return doc_agg.crossJoin(ev_agg)


def web_pages(
    spark: SparkSession,
    sf_dir: str,
    limit: int = 10,
    offset: int = 0,
    sort_by: str = "doc_id",
    sort_order: str = "desc",
    query: str = "",
    stem: bool = False,
) -> DataFrame:
    """``GET /web-pages``: optional full-text filter + dynamic sort +
    offset/limit pagination (reference search.py:47-74). Ties broken by
    doc_id so pages are stable. ``stem=True`` matches across English
    inflections (the reference's to_tsquery('english', ...) behavior —
    SURVEY §7 decision 2); off by default for oracle parity."""
    docs = load_table(spark, sf_dir, "documents")
    if query:
        docs = docs.filter(X.ts_match("text", query, stem=stem))
    key = F.col(sort_by).desc() if sort_order.lower() == "desc" else F.col(sort_by).asc()
    return (
        docs.select("doc_id", "source", "lang", "n_chars")
        .orderBy(key, F.col("doc_id").asc())
        .offset(offset)
        .limit(limit)
    )
