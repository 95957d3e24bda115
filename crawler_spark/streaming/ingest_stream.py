"""Streaming ingest: unbounded flow of fetched pages → parse → embed →
idempotent url-keyed merge (SURVEY.md §2.11).

Mirrors the reference's spider→queue→worker flow (at-least-once
delivery + upsert-on-url idempotence — celery_app.py:23, tasks.py:24-25,
db.py:48) as a Structured Streaming job: the file/Kafka source replays
give at-least-once, and ``foreachBatch`` + merge-by-url makes the sink
idempotent, so the pipeline is effectively exactly-once on the pages
table.

Scale design — the pages table is PARTITIONED by a stable domain-hash
bucket, and each micro-batch:
  1. computes the (small) set of buckets its urls touch,
  2. reads ONLY those partitions of the existing table (partition
     pruning on the directory layout),
  3. merges, and rewrites ONLY those partitions via dynamic partition
     overwrite.
A batch therefore costs O(touched partitions), not O(table) — the r1
implementation re-read and rewrote the whole table every batch. A url
always lands in the same bucket (bucket = f(domain), domain = f(url)),
so the per-url merge never needs to look outside its partition. With
Delta on the classpath this becomes ``MERGE INTO`` with file-level
pruning; the call sites are unchanged.

Dead-letter rows (D5) are written into an ``epoch_id=`` partition via
dynamic overwrite: a REPLAYED micro-batch overwrites its own epoch's
partition instead of appending duplicates, so the dead-letter sink is
idempotent under at-least-once replay too.

Atomicity note: dynamic partition overwrite stages files per-partition
through Spark's commit protocol; on a local filesystem a crash mid-
commit can leave one partition renamed and another not (object stores
with atomic rename per file have the same window). This is strictly
narrower than r1's rmtree+rename window, which could lose the WHOLE
table; Delta's transaction log is the full fix.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark import schemas
from crawler_spark.functions.embedding import StubEmbedder
from crawler_spark.plans.ingest import embed_stage, finalize_pages, parse_stage, split_dead_letter

DEFAULT_NUM_BUCKETS = 16


def domain_bucket(domain_col: str | Column, num_buckets: int = DEFAULT_NUM_BUCKETS) -> Column:
    """Stable partition key: hash-bucket of the page's domain. Domains
    are the natural locality key for crawl data (a recrawl touches few
    domains → few partitions) while hashing keeps bucket sizes even
    when one domain dominates a corpus."""
    return F.pmod(F.xxhash64(domain_col), F.lit(num_buckets)).cast("int")


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


def make_batch_processor(
    pages_dir: str,
    dead_dir: str,
    embedder: StubEmbedder | None = None,
    dims: int = schemas.EMBEDDING_DIMS,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
):
    """The foreachBatch body, exposed so tests can drive a micro-batch
    (and REPLAY one with the same epoch_id) without a running stream."""
    from crawler_spark.operators.upsert import merge_by_key

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # parse once: both the pages chain and the dead-letter write
        # hang off this frame, and without the boundary each action
        # would re-run the HTML-parse UDFs
        items = parse_stage(batch_df).localCheckpoint(eager=True)
        ok, dead = split_dead_letter(items)
        # materialize the expensive embed stage exactly ONCE, before
        # anything consumes it — deriving `touched` from the lazy frame
        # and checkpointing later would run the embedding UDF (HTTP
        # calls + retries in the real path) twice per micro-batch
        pages = (
            finalize_pages(embed_stage(ok, embedder, dims))
            .withColumn("bucket", domain_bucket("domain", num_buckets))
            .localCheckpoint(eager=True)
        )
        table_exists = os.path.isdir(pages_dir) and any(
            not f.startswith((".", "_")) for f in os.listdir(pages_dir)
        )
        if table_exists:
            # the buckets this batch touches — bounded by batch size
            touched = [r["bucket"] for r in pages.select("bucket").distinct().collect()]
            existing = spark.read.parquet(pages_dir).filter(
                F.col("bucket").isin(touched)  # prunes to touched partitions
            )
            # second (cheap) boundary: the merge join must not keep a
            # lineage into the path the write below overwrites; it
            # recomputes only the join over the checkpointed batch and
            # the pruned existing partitions, never the embed stage
            pages = merge_by_key(
                existing, pages, key="url", recency_col="last_crawled"
            ).localCheckpoint(eager=True)
        (
            pages.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(pages_dir)
        )
        # epoch-keyed dead-letter: replayed batches overwrite their own
        # partition instead of appending duplicates
        (
            dead.select("url", "error")
            .withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(dead_dir)
        )

    return process_batch


def start_ingest_stream(
    fetched_stream: DataFrame,
    pages_dir: str,
    dead_dir: str,
    checkpoint_dir: str,
    embedder: StubEmbedder | None = None,
    dims: int = schemas.EMBEDDING_DIMS,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
):
    """Run parse→validate→embed per micro-batch and MERGE into the
    bucket-partitioned pages table via foreachBatch (see module
    docstring for the partition-pruned merge discipline)."""
    return (
        fetched_stream.writeStream.foreachBatch(
            make_batch_processor(pages_dir, dead_dir, embedder, dims, num_buckets)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
