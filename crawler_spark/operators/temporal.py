"""Temporal joins Spark lacks as built-ins (north-star custom
operators): as-of join and bucketed range join.

Both are implemented as compositions of existing DataFrame operators —
no UDF, no per-row Python — so they stay inside whole-stage codegen
and scale like any window/join:

* ``asof_join``: the classic distributed shape — union both sides with
  a source marker, ONE window per key ordered by (time, marker) with
  ``last(..., ignorenulls=True)`` carrying the most recent right-side
  values forward, then keep only left rows. One shuffle on the key,
  no inequality join, no per-key driver loop. pandas users know this
  as ``merge_asof``; Flink as a temporal table join.

* ``range_join_buckets``: interval join (left.t BETWEEN right.lo AND
  right.hi) without the BroadcastNestedLoop a naive inequality join
  plans: intervals explode into the fixed-width buckets they overlap,
  points key into their bucket, the join is an EQUI-join on
  (key, bucket) refined by the exact predicate. Shuffle is keyed by
  (key, bucket) — bucket width trades replication (wide intervals hit
  more buckets) against per-bucket fan-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the ``value_cols`` of the most recent
    right row with the same ``by`` key and right.``on`` <= left.``on``
    (direction='backward'; ties match — a right row AT the left row's
    timestamp wins, matching DuckDB ASOF and pandas merge_asof
    defaults), or the NEAREST FOLLOWING right row with right.``on`` >=
    left.``on`` (direction='forward', merge_asof semantics — ties still
    match). Left rows with no matching right row keep NULLs.

    All ``value_cols`` travel as ONE struct carried by a single
    ``last``/``first(ignorenulls=True)`` — so every output value comes
    from the SAME matched right row. Carrying columns independently
    (the naive form) silently mixes rows when right-side values contain
    NULLs: an older non-NULL value would override the matched row's
    legitimate NULL, diverging from merge_asof/DuckDB ASOF semantics.
    """
    from pyspark.sql.types import StructField, StructType

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = [c for c in left.columns]
    r_struct = StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    tagged_left = left.select(
        *lcols,
        F.lit(None).cast(r_struct).alias("__r"),
        F.lit(1).alias("__src"),
    )
    # backward: right rows sort BEFORE left rows at equal timestamps so
    # a tie is visible looking back; forward: right rows sort AFTER so
    # a tie is visible looking ahead — merge_asof in both directions
    right_src = 0 if direction == "backward" else 2
    # right rows with a NULL key or NULL timestamp can never be a
    # legitimate asof match (merge_asof raises on them; DuckDB ASOF
    # never matches NULL) — kept in, a NULL-`by` right row would pair
    # with NULL-`by` left rows through the window partition
    tagged_right = right.where(
        F.col(on).isNotNull() & F.col(by).isNotNull()
    ).select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in (on, by) else F.col(c)
          for c in lcols],
        F.struct(*[F.col(c) for c in value_cols]).alias("__r"),
        F.lit(right_src).alias("__src"),
    )
    if direction == "backward":
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).asc(), F.col("__src").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last("__r", ignorenulls=True)
    else:
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).asc(), F.col("__src").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first("__r", ignorenulls=True)
    unioned = tagged_left.unionByName(tagged_right)
    carried = unioned.select("*", carry.over(w).alias("__asof"))
    # a left row with a NULL timestamp matches nothing: NULLs sort
    # first, so under direction='forward' the unbounded-following
    # frame would otherwise hand it the chronologically FIRST right
    # row as a spurious match
    matched = F.when(F.col(on).isNotNull(), F.col("__asof"))
    return (
        carried.filter(F.col("__src") == 1)
        .select(*lcols,
                *[matched[c].alias(f"asof_{c}") for c in value_cols])
    )


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_t: str,
    lo: str,
    hi: str,
    by: str,
    bucket_width_sec: int = 3600,
    keep: list[str] | None = None,
) -> DataFrame:
    """Equi-join rewrite of ``points.t BETWEEN intervals.lo AND
    intervals.hi`` (inclusive) within a ``by`` key: each interval
    explodes into every bucket it overlaps, points hash to one bucket,
    and the exact BETWEEN refines after the (key, bucket) equi-join.
    Output has every point column plus the interval's lo/hi and any
    extra interval columns named in ``keep`` (e.g. the interval's own
    id, so callers can aggregate per interval)."""
    width = F.lit(bucket_width_sec)
    p_bucket = (F.unix_timestamp(F.col(point_t)) / width).cast("long")
    i_buckets = F.sequence(
        (F.unix_timestamp(F.col(lo)) / width).cast("long"),
        (F.unix_timestamp(F.col(hi)) / width).cast("long"),
    )
    p = points.withColumn("__bucket", p_bucket)
    i = intervals.select(
        F.col(by).alias("__by"), lo, hi, *(keep or []),
        F.explode(i_buckets).alias("__bucket"),
    )
    return (
        p.join(i, (F.col(by) == F.col("__by")) & (p["__bucket"] == i["__bucket"]))
        .filter((F.col(point_t) >= F.col(lo)) & (F.col(point_t) <= F.col(hi)))
        .drop("__bucket", "__by")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    by: str,
    bucket_width_sec: int = 86400,
) -> DataFrame:
    """Interval×interval overlap join within a ``by`` key —
    ``[l_lo,l_hi] ∩ [r_lo,r_hi] ≠ ∅`` (inclusive) — as an equi-join, the
    two-sided generalization of ``range_join_buckets``. A naive
    inequality join plans BroadcastNestedLoop; here BOTH sides explode
    into the fixed-width buckets they cover and join on (key, bucket),
    with the exact overlap predicate refining after.

    An overlapping pair shares every bucket in the overlap region; to
    emit it exactly once WITHOUT a distinct (which would shuffle the
    full pair stream again), the pair is claimed only in its canonical
    bucket — ``greatest(bucket(l_lo), bucket(r_lo))``, the first bucket
    both intervals cover, which exists iff they overlap. Shuffle is
    keyed on (key, bucket): width trades interval replication (wide
    intervals hit more buckets) against per-bucket fan-in, exactly as
    in the point-in-interval variant. Output: all left columns plus
    the right columns (caller prefixes/renames to avoid collisions).
    """
    width = F.lit(bucket_width_sec)

    def buckets(lo: str, hi: str) -> F.Column:
        return F.sequence(
            (F.unix_timestamp(F.col(lo)) / width).cast("long"),
            (F.unix_timestamp(F.col(hi)) / width).cast("long"),
        )

    lb = left.withColumn("__lbucket", F.explode(buckets(l_lo, l_hi)))
    rb = right.select(
        F.col(by).alias("__by"), *(c for c in right.columns if c != by),
        F.explode(buckets(r_lo, r_hi)).alias("__rbucket"),
    )
    canonical = F.greatest(
        (F.unix_timestamp(F.col(l_lo)) / width).cast("long"),
        (F.unix_timestamp(F.col(r_lo)) / width).cast("long"),
    )
    return (
        lb.join(rb, (F.col(by) == F.col("__by"))
                & (F.col("__lbucket") == F.col("__rbucket")))
        .filter(
            (F.col(l_lo) <= F.col(r_hi))
            & (F.col(r_lo) <= F.col(l_hi))
            & (F.col("__lbucket") == canonical)
        )
        .drop("__lbucket", "__rbucket", "__by")
    )
