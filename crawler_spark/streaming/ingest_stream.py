"""Streaming ingest: unbounded flow of fetched pages → parse → embed →
idempotent url-keyed merge (SURVEY.md §2.11).

Mirrors the reference's spider→queue→worker flow (at-least-once
delivery + upsert-on-url idempotence — celery_app.py:23, tasks.py:24-25,
db.py:48) as a Structured Streaming job: the file/Kafka source replays
give at-least-once, and ``foreachBatch`` + merge-by-url makes the sink
idempotent, so the pipeline is effectively exactly-once on the pages
table. Dead-letter rows append to a separate sink (D5).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from crawler_spark import schemas
from crawler_spark.functions.embedding import StubEmbedder
from crawler_spark.plans.ingest import embed_stage, finalize_pages, parse_stage, split_dead_letter


def read_fetched_stream(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Stream of FETCHED rows (url, content_type, body, fetch_error)
    dropped as parquet into ``dir_path`` — the queue between the fetch
    tier and the processing tier (the reference's Redis boundary S8)."""
    return (
        spark.readStream.schema(schemas.FETCHED)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )


def start_ingest_stream(
    fetched_stream: DataFrame,
    pages_dir: str,
    dead_dir: str,
    checkpoint_dir: str,
    embedder: StubEmbedder | None = None,
    dims: int = schemas.EMBEDDING_DIMS,
):
    """Run parse→validate→embed per micro-batch and MERGE into the
    pages table via foreachBatch.

    The merge re-reads the current pages parquet, window-dedups against
    the batch keyed by url, and rewrites — the no-Delta merge rewrite
    (operators/upsert.py). With Delta on the classpath this becomes
    ``MERGE INTO`` and stops rewriting unmatched files; call sites are
    unchanged. Checkpointing makes replayed batches converge to the
    same table state (idempotent merge), so failures don't duplicate
    pages.
    """
    from crawler_spark.operators.upsert import merge_by_key

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        items = parse_stage(batch_df)
        ok, dead = split_dead_letter(items)
        pages = finalize_pages(embed_stage(ok, embedder, dims))
        if os.path.isdir(pages_dir) and any(
            f.endswith(".parquet") for f in os.listdir(pages_dir)
        ):
            existing = spark.read.parquet(pages_dir)
            pages = merge_by_key(existing, pages, key="url", recency_col="last_crawled")
        # rewrite atomically-enough for local fs: write then swap
        tmp = pages_dir.rstrip("/") + ".tmp"
        pages.write.mode("overwrite").parquet(tmp)
        import shutil

        if os.path.isdir(pages_dir):
            shutil.rmtree(pages_dir)
        os.replace(tmp, pages_dir)
        dead.select("url", "error").write.mode("append").parquet(dead_dir)

    return (
        fetched_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
