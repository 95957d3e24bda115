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

Spark's built-in ``dropDuplicates`` on streams covers the same basic
case but couples eviction to watermarks; the custom operator owns its
state layout (first-seen timestamp, occurrence count could be added)
and its timeout policy (``GroupStateTimeout.ProcessingTimeTimeout``
would bound state for sources whose duplicates arrive close together —
the honest tradeoff at unbounded scale, documented not hidden).
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


def streaming_exact_dedup(pages_stream: DataFrame, content_col: str = "content") -> DataFrame:
    """First-seen-wins exact dedup over a streaming pages source: rows
    keyed by the md5 fingerprint of normalized content (the same
    fingerprint as the batch dedup_exact oracle query), one state
    entry per fingerprint."""
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
