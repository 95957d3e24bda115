"""Custom stateful streaming operators (SURVEY.md §2.11 extension /
the training-data-pipeline north star): exact dedup over an unbounded
stream with ``applyInPandasWithState``.

Batch dedup (plans/queries_text.py dedup_exact) sees the whole corpus;
a 100 TB ingest stream can't. The streaming form keeps one tiny state
entry per content fingerprint (GroupState keyed by the fingerprint —
Spark shards the state store by the groupBy key, so state scales
horizontally with executors) and emits each fingerprint's FIRST row
only. Replayed micro-batches re-observe fingerprints already in state
and emit nothing — at-least-once replay stays exactly-once downstream.

State growth is the honest tradeoff at unbounded scale: with no
eviction, state is one entry per distinct fingerprint ever seen.
``streaming_dedup_within_horizon`` below is the bounded-state
companion: it rides Spark's built-in ``dropDuplicatesWithinWatermark``
(watermark-evicted dedup state), so fingerprints older than the
horizon age out, state size plateaus at the active-within-horizon
distinct count, and a duplicate arriving after its fingerprint aged
out re-emits — the right contract for sources whose duplicates
cluster in time (crawl recrawls, replayed feeds).

Why the horizon variant is NOT a GroupState timeout on the custom
operator: in this PySpark build, ``applyInPandasWithState`` with
``GroupStateTimeout.ProcessingTimeTimeout`` deadlocks the worker —
the timed-out branch (pyspark/worker.py:885-889) calls
``next(value_series_gen)`` to recover the column schema, the
generator is empty for a timed-out key, and the escaping
StopIteration truncates the Arrow stream protocol mid-batch, leaving
the JVM blocked on a read that never completes (reproduced and
stack-confirmed). ``transformWithStateInPandas`` (the Spark 4 timer
API) needs protobuf, absent from this image. The watermark-evicted
built-in is the better plan anyway: eviction is driven by the same
event-time watermark the rest of the streaming pipeline already
advances, and the state layout is the engine's, not a Python shim's.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUTPUT = StructType(
    [
        StructField("fp", StringType()),
        StructField("url", StringType()),
        StructField("content", StringType()),
    ]
)
DEDUP_STATE = StructType([StructField("n_seen", LongType())])


def _first_seen(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit the first row ever observed for this fingerprint; count the
    rest into state (occurrence count — cheap dup-rate telemetry)."""
    n_new = 0
    first: pd.DataFrame | None = None
    for pdf in pdfs:
        n_new += len(pdf)
        if first is None and len(pdf):
            first = pdf.iloc[[0]]
    already = state.exists
    (n_prev,) = state.get if already else (0,)
    state.update((n_prev + n_new,))
    if not already and first is not None:
        yield pd.DataFrame(
            {
                "fp": [key[0]],
                "url": first["url"].tolist(),
                "content": first["content"].tolist(),
            }
        )


def streaming_exact_dedup(
    pages_stream: DataFrame, content_col: str = "content"
) -> DataFrame:
    """First-seen-wins exact dedup over a streaming pages source: rows
    keyed by the md5 fingerprint of normalized content (the same
    fingerprint as the batch dedup_exact oracle query), one state
    entry per fingerprint. Full-history semantics: state grows with
    the distinct-fingerprint count — use
    ``streaming_dedup_within_horizon`` when a bounded dup-horizon
    applies and state must plateau.
    """
    from crawler_spark.functions import text as X

    keyed = pages_stream.select(
        X.fingerprint(content_col).alias("fp"),
        "url",
        F.col(content_col).alias("content"),
    )
    return keyed.groupBy("fp").applyInPandasWithState(
        _first_seen,
        outputStructType=DEDUP_OUTPUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_within_horizon(
    pages_stream: DataFrame,
    content_col: str = "content",
    event_time_col: str = "fetched_at",
    horizon_sec: int = 3600,
) -> DataFrame:
    """Bounded-state streaming dedup: first-seen-wins within
    ``horizon_sec`` of event time, state evicted by the watermark.

    Built on ``dropDuplicatesWithinWatermark`` — the engine keeps one
    state entry per fingerprint and drops it once the watermark passes
    the entry's event time plus the horizon, so state size tracks the
    DISTINCT fingerprints active within a horizon window instead of
    all history (the module docstring explains why this is the
    watermark built-in rather than a GroupState timeout). A duplicate
    arriving after its fingerprint aged out re-emits: the bounded-
    horizon contract, the right one for duplicates that cluster in
    time. Rows must carry an event-time column (the ingest stream's
    ``fetched_at``); the watermark it advances is the same one any
    downstream windowed aggregation would use.
    """
    from crawler_spark.functions import text as X

    keyed = pages_stream.select(
        X.fingerprint(content_col).alias("fp"),
        "url",
        F.col(content_col).alias("content"),
        F.col(event_time_col).cast("timestamp").alias("event_time"),
    )
    return keyed.withWatermark(
        "event_time", f"{int(horizon_sec)} seconds"
    ).dropDuplicatesWithinWatermark(["fp"])
