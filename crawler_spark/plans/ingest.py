"""Batch ingest pipeline: frontier → fetch → parse → validate → embed →
pages (SURVEY.md §3.2, re-expressed as one Spark job).

The reference runs this as 6 process/network boundaries (FastAPI →
Redis → Celery worker → Scrapy subprocess → Redis fan-out → per-page
worker → Postgres). Here each boundary is a DataFrame stage inside a
single lazily-planned job; the only Python-side stages are fetch/parse
(mapInPandas — network + HTML parsing) and embedding (pandas UDF —
model call). Everything else is JVM-side expressions.

Per-row errors never fail a stage: they land in the ``error`` column
and are split into a dead-letter DataFrame at the end (the reference's
dead-letter queue, celery_app.py:25-34 → SURVEY.md §2.10 D5).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark import schemas
from crawler_spark.functions.embedding import StubEmbedder
from crawler_spark.sources.fetch import Fetcher
from crawler_spark.sources.file_handlers import classify_content_type, extract_pdf_text


def fetch_frontier(spark: SparkSession, fetcher: Fetcher, urls: list[str]) -> DataFrame:
    """S5: fetch a frontier of urls on the executors.

    The fetcher is pickled into the closure (stub: in-memory dict;
    http: config only) — each partition fetches its slice, so crawl
    concurrency is partition parallelism, the Spark analogue of the
    reference's CONCURRENT_REQUESTS (crawlers/README.md:298-321).
    """
    frontier = spark.createDataFrame([(u,) for u in urls], "url string")

    def do_fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url in pdf["url"]:
                ctype, body, err = fetcher.fetch(url)
                rows.append(
                    {"url": url, "content_type": ctype, "body": body, "fetch_error": err}
                )
            yield pd.DataFrame(rows, columns=["url", "content_type", "body", "fetch_error"])

    par = spark.sparkContext.defaultParallelism
    return frontier.repartition(max(1, min(len(urls), par))).mapInPandas(
        do_fetch, schema=schemas.FETCHED
    )


def parse_stage(fetched: DataFrame) -> DataFrame:
    """P5 dispatch + F4-F7 extraction → PAGE_ITEM rows.

    html → stdlib parse (title/meta/content/links); pdf → text extract,
    empty ⇒ error-row (reference drops empty PDFs, file_handler.py:29-32);
    image → metadata row with content=None, embedding_type='vision';
    other/missing content types ⇒ error rows (dead-letter).
    """
    from crawler_spark.functions.html import parse_html

    def do_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                base = {
                    "url": r.url, "title": None, "meta_description": None,
                    "meta_tags": None, "content": None, "file_type": None,
                    "embedding_type": "text", "links": None, "error": None,
                }
                if r.fetch_error is not None:
                    rows.append({**base, "error": f"fetch: {r.fetch_error}"})
                    continue
                kind = classify_content_type(r.content_type)
                if kind == "html":
                    page = parse_html(
                        bytes(r.body).decode("utf-8", errors="replace"), base_url=r.url
                    )
                    rows.append({
                        **base, "file_type": "html", "title": page.title,
                        "meta_description": page.meta_description,
                        "meta_tags": page.meta_tags or None,
                        "content": page.content, "links": page.links,
                    })
                elif kind == "pdf":
                    text = extract_pdf_text(bytes(r.body) if r.body is not None else None)
                    if text is None:
                        rows.append({**base, "file_type": "pdf",
                                     "error": "pdf: empty or undecodable text"})
                    else:
                        rows.append({**base, "file_type": "pdf", "content": text})
                elif kind == "image":
                    rows.append({**base, "file_type": "image",
                                 "embedding_type": "vision"})
                else:
                    rows.append({**base, "error": f"unsupported content type: {r.content_type}"})
            yield pd.DataFrame(rows, columns=[f.name for f in schemas.PAGE_ITEM.fields])

    return fetched.mapInPandas(do_parse, schema=schemas.PAGE_ITEM)


def split_dead_letter(items: DataFrame) -> tuple[DataFrame, DataFrame]:
    """D5: split the error branch off; also apply the reference's
    validity drops (no url; non-image without content —
    tasks.py:66-74) into the dead-letter side."""
    invalid = (
        F.col("error").isNotNull()
        | F.col("url").isNull()
        | ((F.col("file_type") != "image") & F.col("content").isNull())
    )
    ok = items.filter(~invalid)
    dead = items.filter(invalid).withColumn(
        "error",
        F.coalesce(
            F.col("error"),
            F.when(F.col("url").isNull(), F.lit("validation: missing url"))
            .otherwise(F.lit("validation: missing content")),
        ),
    )
    return ok, dead


def embed_stage(
    items: DataFrame,
    embedder: StubEmbedder | None = None,
    dims: int = schemas.EMBEDDING_DIMS,
) -> DataFrame:
    """V8 dispatch: text items embed content, image items embed the url
    via the vision model. The ingest invariant V2∘V3 (normalize +
    truncate/pad — reference tasks.py:79-88) is applied inside the
    Arrow-batched UDFs."""
    from crawler_spark.functions.embedding import text_embed_udf, vision_embed_udf

    text_udf = text_embed_udf(embedder, dims)
    vision_udf = vision_embed_udf(embedder, dims)
    embedding = F.when(
        F.col("embedding_type") == "vision", vision_udf(F.col("url"))
    ).otherwise(text_udf(F.col("content")))
    return items.withColumn("embedding", embedding)


def finalize_pages(items: DataFrame) -> DataFrame:
    """Shape embedded items into the web_pages schema: derive domain
    (F1), stamp last_crawled (F12), project canonical columns."""
    return items.select(
        "url",
        F.parse_url("url", F.lit("HOST")).alias("domain"),
        "title",
        "meta_description",
        "meta_tags",
        "content",
        "embedding",
        "file_type",
        "embedding_type",
        F.lit(None).cast("string").alias("structured_data"),
        F.current_timestamp().alias("last_crawled"),
    )


def ingest_batch(
    spark: SparkSession,
    fetcher: Fetcher,
    urls: list[str],
    existing_pages: DataFrame | None = None,
    embedder: StubEmbedder | None = None,
    dims: int = schemas.EMBEDDING_DIMS,
) -> tuple[DataFrame, DataFrame]:
    """Full batch ingest of a url list.

    Returns (pages, dead_letter): pages = existing merged with the new
    wave keyed by url (S9 upsert semantics), dead_letter = error rows.
    """
    from crawler_spark.operators.upsert import merge_by_key

    fetched = fetch_frontier(spark, fetcher, urls)
    items = parse_stage(fetched)
    ok, dead = split_dead_letter(items)
    pages = finalize_pages(embed_stage(ok, embedder, dims))
    if existing_pages is not None:
        pages = merge_by_key(existing_pages, pages, key="url", recency_col="last_crawled")
    return pages, dead.select("url", "error")
