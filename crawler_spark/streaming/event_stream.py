"""Structured Streaming over event streams (SURVEY.md §2.11, §7 M5).

The reference's "streaming" is a Celery task queue with no event-time
semantics; these operators are the engine's genuine stream-processing
surface, and each mirrors an oracle-checked batch query in
plans/queries_events.py so streaming results can be validated against
the batch path (same expressions → same semantics).

All sources are file streams here (the test/bench environment has no
Kafka); swapping ``readStream.parquet`` for ``readStream.format("kafka")``
changes nothing downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based event stream (parquet drops into ``dir_path``)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )


def tumbling_hourly(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ``ev_tumbling_hourly``: 1-hour tumbling window
    per event_type with a late-data watermark. In append mode a window
    emits once the watermark passes its end — exactly-once counts with
    bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("bucket_start"), "event_type", "n", "total_value"
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ``ev_sessionize``: native session_window with
    the same 30-minute gap. State per open session, closed by
    watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

_TRENDING_STOPWORDS = ["the", "of", "and", "to", "in", "a", "is", "that"]


def read_doc_stream(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based document stream (parquet drops into ``dir_path``)."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )


def trending_token_counts(
    docs: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming half of trending-tokens: per (sliding window, token)
    counts over a watermarked document stream, stopwords dropped before
    the explode so the hottest tokens never shuffle at all.

    The per-window TOP-K is deliberately NOT in this query: ranking
    over a streaming aggregate needs the window closed, which append
    mode only knows at watermark expiry — so the production shape is
    this bounded-state windowed count feeding a sink, with
    ``top_tokens_per_window`` ranking the sink batch-side (a dashboard
    query over dozens of rows per window, not a corpus op). Chaining
    rank into the streaming plan would force complete mode's unbounded
    result table instead."""
    from crawler_spark.functions import text as X

    toks = docs.select(
        "ts",
        F.explode(F.array_distinct(X.tokenize("text"))).alias("token"),
    ).where(~F.col("token").isin(_TRENDING_STOPWORDS))
    return (
        toks.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "token")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.col("window.start").alias("window_start"), "token", "n_docs")
    )


def top_tokens_per_window(counts: DataFrame, k: int = 5) -> DataFrame:
    """Batch-side rank over the streaming sink: top-k tokens per window
    by document count (ties broken on token for determinism)."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.col("n_docs").desc(), F.col("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def run_to_memory_sink(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query over whatever files already exist and
    stop — the synchronous smoke path (processAllAvailable)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q


def attribution_pairs(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``ev_attribution_interval``'s core: a
    watermarked STREAM-STREAM inner join emitting one row per
    (purchase, click-within-the-preceding-window) pair. Downstream
    counts per purchase are a grouped aggregate over these pairs.

    State stays bounded because BOTH sides carry a watermark and the
    join predicate carries a two-sided time range: Spark derives that a
    buffered click can only match purchases in [click_ts, click_ts +
    window], so click state older than watermark + window is evicted,
    and symmetric for purchases — the textbook bounded-state
    stream-stream join shape. At 100 TB/day the same plan runs over
    Kafka sources; nothing below the source changes.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    return p.join(
        c,
        (p["user_id"] == c["c_user"])
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select("p_id", "user_id", "p_ts", "c_ts")


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against
    the (broadcast) dimension snapshot — the third §2.11 join shape
    beside the watermarked stream-stream join and the stateful
    operators. The static side re-resolves per batch, so a dimension
    backed by a table picks up updates between triggers; no state, no
    watermark — the stream side never buffers."""
    return events.join(F.broadcast(dim), key, "left")
