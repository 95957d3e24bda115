"""Upsert / merge semantics without a transactional table format
(SURVEY.md §2.1 S9-S12).

The reference upserts pages by url (`INSERT ... ON CONFLICT (url) DO
UPDATE`, backend/src/db.py:42-69) and row-updates jobs by id
(db.py:128-163). Delta/Iceberg jars aren't in this image, so MERGE is
expressed as the classic window-dedup rewrite: union both sides, keep
rank-1 per key with incoming rows winning ties. On a Delta-enabled
cluster, swap `merge_by_key` for `MERGE INTO` — the call sites don't
change.

Scale note: the window partitions by the merge key, so this is one
shuffle on a high-cardinality key (url/id) — same shuffle MERGE would
do. Incremental batches should be small relative to the base table;
with Delta the rewrite becomes file-pruned instead of full-table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PRIO = "__merge_priority"
_RN = "__merge_rn"


def merge_by_key(
    existing: DataFrame,
    incoming: DataFrame,
    key: str,
    recency_col: str | None = None,
) -> DataFrame:
    """Keep one row per key: the incoming row beats the existing one
    unconditionally (the reference's ``INSERT ... ON CONFLICT DO
    UPDATE`` always overwrites — backend/src/db.py:42-58); only among
    multiple *incoming* rows for the same key does the most recent
    ``recency_col`` pick the winner. Priority therefore sorts ABOVE
    recency — an existing row with a future-dated timestamp must still
    lose to the incoming row."""
    ex = existing.withColumn(_PRIO, F.lit(0))
    inc = incoming.withColumn(_PRIO, F.lit(1))
    merged = ex.unionByName(inc, allowMissingColumns=True)
    order = [F.col(_PRIO).desc()]
    if recency_col is not None:
        order.append(F.col(recency_col).desc_nulls_last())
    w = Window.partitionBy(key).orderBy(*order)
    return (
        merged.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN, _PRIO)
    )


def delete_by_key(df: DataFrame, keys: DataFrame, key: str) -> DataFrame:
    """S12 delete = anti-join on the key column."""
    return df.join(keys.select(key).distinct(), key, "left_anti")


def update_columns(
    df: DataFrame, key: str, key_value, updates: dict[str, object]
) -> DataFrame:
    """S11 dynamic-SET row update, columnwise:
    ``when(key==k, new_value).otherwise(old)`` per updated column."""
    out = df
    hit = F.col(key) == F.lit(key_value)
    for col, val in updates.items():
        out = out.withColumn(col, F.when(hit, F.lit(val)).otherwise(F.col(col)))
    return out
