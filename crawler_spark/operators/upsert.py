"""Upsert / merge semantics without a transactional table format
(SURVEY.md §2.1 S9-S12).

The reference upserts pages by url (`INSERT ... ON CONFLICT (url) DO
UPDATE`, backend/src/db.py:42-69) and row-updates jobs by id
(db.py:128-163). Delta/Iceberg jars aren't in this image, so MERGE is
expressed as the classic window-dedup rewrite: union both sides, keep
rank-1 per key with incoming rows winning ties. On a Delta-enabled
cluster, swap `merge_by_key` for `MERGE INTO` — the call sites don't
change.

Scale note: the window partitions by the merge key, so `merge_by_key`
alone is one shuffle on a high-cardinality key (url/id) over BOTH
sides — fine when both fit a stage, wrong at 100 TB where the base
table dwarfs every batch. `merge_into_bucketed` is the table-format
answer built on the manifest layer (streaming/ingest_stream.py): the
table is laid out by a stable key-hash bucket, a batch reads and
rewrites ONLY the buckets its keys touch, and the commit is one
manifest swap — Delta's file-pruned MERGE INTO, same O(batch) cost
shape, without the jars.
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


def scd2_apply(
    existing: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_date,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Slowly-Changing-Dimension type-2 merge (Kimball): apply an
    update batch to a versioned dimension, KEEPING history — a changed
    row's current version is closed (``valid_to`` = effective date,
    ``is_current`` = false) and a new current version opens; a no-op
    update (every tracked column equal, null-safely) changes NOTHING;
    a brand-new key inserts as current. The reference's pages table
    overwrites on conflict (backend/src/db.py:42-58) — SCD2 is what a
    recrawl pipeline needs instead when downstream training snapshots
    must be reproducible against the dimension AS OF their build date
    (the as-of join, operators/temporal.py, is the natural reader).

    ``existing`` carries ``key``, ``tracked``, and the three validity
    columns; ``updates`` carries ``key`` + ``tracked`` only, at most
    one row per key (enforce upstream with ``merge_by_key``).

    Scale: closed history rows pass through UNTOUCHED (no join) — only
    the current slice joins the batch, one shuffle on the key, and the
    batch side broadcasts when small, so cost tracks the CURRENT
    dimension size, never accumulated history. At lakehouse scale,
    partition the table on ``is_current`` so the history scan prunes
    away entirely."""
    if not tracked:
        # without tracked columns there is no change predicate — fail
        # loudly instead of a Py4J Column-type error downstream
        raise ValueError("scd2_apply: tracked must be non-empty")
    eff = F.lit(effective_date).cast("date")
    changed_pred = None
    for c in tracked:
        ne = ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
        changed_pred = ne if changed_pred is None else (changed_pred | ne)

    # NULL-safe split: rows read through mergeSchema AFTER is_current
    # was added in a later epoch carry is_current = NULL, and a plain
    # boolean filter drops them from BOTH slices — silent row loss the
    # next rewrite makes permanent (review-found). Pre-evolution rows
    # were the live dimension rows when the column appeared, so NULL
    # is treated as current; their next touch writes a concrete flag.
    cur_flag = F.coalesce(F.col(is_current).cast("boolean"), F.lit(True))
    history = existing.filter(~cur_flag)
    current = existing.filter(cur_flag)
    out_cols = [key, *tracked, valid_from, valid_to, is_current]

    # presence flags via validity/tracked cols can be fooled by NULL
    # payloads — tag each side explicitly instead
    cur_tag = current.alias("cur").withColumn("__has_cur", F.lit(True))
    upd_tag = updates.alias("upd").withColumn("__has_upd", F.lit(True))
    joined = cur_tag.join(upd_tag, on=key, how="full_outer")
    has_cur = F.coalesce(F.col("__has_cur"), F.lit(False))
    has_upd = F.coalesce(F.col("__has_upd"), F.lit(False))
    closes = has_cur & has_upd & changed_pred

    kept_or_closed = joined.filter(has_cur).select(
        F.col(key),
        *[F.col(f"cur.{c}").alias(c) for c in tracked],
        F.col(f"cur.{valid_from}").alias(valid_from),
        F.when(closes, eff).otherwise(F.col(f"cur.{valid_to}"))
         .alias(valid_to),
        (~closes).alias(is_current),
    )
    opens = joined.filter(has_upd & (closes | ~has_cur)).select(
        F.col(key),
        *[F.col(f"upd.{c}").alias(c) for c in tracked],
        eff.alias(valid_from),
        F.lit(None).cast("date").alias(valid_to),
        F.lit(True).alias(is_current),
    )
    return (
        history.select(*out_cols)
        .unionByName(kept_or_closed)
        .unionByName(opens)
    )


def key_bucket(key_col: str, num_buckets: int = 16):
    """Stable hash-bucket for an arbitrary merge key — the partition
    column a bucketed manifest table is laid out by. A key always
    lands in the same bucket, so a per-key merge never needs to look
    outside its partition. ONE definition shared with the streaming
    layer's ``domain_bucket`` (which delegates here): the bucket
    function and the directory layout MUST agree, so a second copy
    that could drift is itself the bug."""
    return F.pmod(F.xxhash64(key_col), F.lit(num_buckets)).cast("int")


def merge_into_bucketed(
    spark,
    table_dir: str,
    source: DataFrame,
    key: str,
    recency_col: str | None = None,
    delete_condition=None,
) -> int:
    """File-pruned MERGE INTO over a bucketed manifest table (the
    batch-shaped form of the streaming processor's bucket-pruned merge,
    streaming/ingest_stream.py): read and rewrite ONLY the buckets the
    source batch touches, so a merge costs O(touched buckets), not
    O(table) — the property Delta's file-pruned ``MERGE INTO`` gives
    you at 100 TB, built here on the same manifest swap the rest of
    the lakehouse layer uses (reference upserts by url via ``INSERT ..
    ON CONFLICT``, backend/src/db.py:42-69; this is that statement's
    table-format form).

    ``source`` must carry the table's ``bucket`` column (use
    ``key_bucket`` for both the initial load and every batch).
    ``delete_condition`` is a post-merge predicate: surviving rows
    matching it are deleted in the same commit (MERGE's WHEN MATCHED
    DELETE, applied after update-wins resolution). Buckets the batch
    touches but empties are dropped from the manifest. Returns the
    committed snapshot version; the whole read-merge-write runs under
    the table's writer lock."""
    from crawler_spark.streaming.ingest_stream import (
        apply_bucket_commit,
        next_commit_epoch,
        read_buckets,
        read_manifest,
        table_write_lock,
    )

    if "bucket" not in source.columns:
        raise ValueError("source must carry the table's bucket column "
                         "(see key_bucket)")
    # pin the batch BEFORE deriving `touched`: a non-deterministic
    # source re-evaluated inside the merge could emit rows for a
    # bucket the existing-read never loaded, silently erasing that
    # bucket's live rows (the streaming processor guards the same
    # window with its eager checkpoint)
    source = source.localCheckpoint(eager=True)
    touched = {int(r.bucket) for r in source.select("bucket").distinct().collect()}
    with table_write_lock(table_dir):
        manifest = read_manifest(table_dir)
        live = {b: manifest[b] for b in touched if b in manifest}
        if live:
            existing = read_buckets(spark, table_dir, live)
            merged = merge_by_key(existing, source, key, recency_col)
        else:
            existing = None
            # same within-batch dedup rule even with no live buckets
            merged = merge_by_key(source.limit(0), source, key, recency_col)
        if delete_condition is not None:
            # WHEN MATCHED DELETE scopes to rows whose key is in BOTH
            # the batch and the live target: batch-only keys are WHEN
            # NOT MATCHED inserts (never deleted), and target rows
            # whose key isn't in the batch must not be deleted just
            # for sharing a hash bucket (layout-dependent data loss)
            src_keys = source.select(key).distinct()
            matched = (
                src_keys.join(existing.select(key).distinct(),
                              key, "left_semi")
                if existing is not None else src_keys.limit(0)
            ).withColumn("__matched", F.lit(True))
            merged = (
                merged.join(F.broadcast(matched), key, "left")
                .filter(~(F.coalesce(delete_condition, F.lit(False))
                          & F.coalesce(F.col("__matched"), F.lit(False))))
                .drop("__matched")
            )
        # epoch from the snapshot log, not max(live manifest): a delete
        # that emptied the max-epoch bucket would otherwise regress the
        # counter and overwrite directories old snapshots reference
        epoch = next_commit_epoch(table_dir)
        return apply_bucket_commit(
            table_dir, merged, epoch, touched=touched, use_lock=False)


def delete_from_bucketed(spark, table_dir: str, keys: DataFrame, key: str) -> int:
    """File-pruned DELETE: anti-join only the buckets holding the keys
    (``keys`` must carry the table's ``bucket`` column); buckets the
    delete empties are dropped from the manifest. Returns the committed
    snapshot version."""
    from crawler_spark.streaming.ingest_stream import (
        apply_bucket_commit,
        manifest_history,
        next_commit_epoch,
        read_buckets,
        read_manifest,
        table_write_lock,
    )

    if "bucket" not in keys.columns:
        raise ValueError("keys must carry the table's bucket column")
    keys = keys.localCheckpoint(eager=True)  # see merge_into_bucketed
    touched = {int(r.bucket) for r in keys.select("bucket").distinct().collect()}
    with table_write_lock(table_dir):
        manifest = read_manifest(table_dir)
        live = {b: manifest[b] for b in touched if b in manifest}
        if not live:  # nothing to delete — current snapshot stands
            history = manifest_history(table_dir)
            return history[-1] if history else 0
        existing = read_buckets(spark, table_dir, live)
        kept = delete_by_key(existing, keys, key)
        epoch = next_commit_epoch(table_dir)  # see merge_into_bucketed
        return apply_bucket_commit(
            table_dir, kept, epoch, touched=touched, use_lock=False)


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
