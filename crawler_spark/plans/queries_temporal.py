"""Temporal-join queries (north-star custom operators SURVEY.md §7:
as-of join, range join). The as-of oracle uses DuckDB's NATIVE
``ASOF LEFT JOIN`` — our union-window implementation is checked
value-for-value against a reference engine's built-in."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.plans.registry import register
from crawler_spark.sources import load_table

# --- as-of: most recent signup at or before each purchase -----------------
@register(
    "asof_last_signup",
    oracle="""
        SELECT p.event_id, p.user_id, p.ts,
               coalesce(s.ts, TIMESTAMP '1970-01-01 00:00:00') AS asof_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts FROM events
                        WHERE event_type = 'signup') s
          ON p.user_id = s.user_id AND s.ts <= p.ts
        ORDER BY p.event_id
    """,
)
def asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the timestamp of the user's most recent
    signup at-or-before it — the attribution join every event pipeline
    needs and Spark has no built-in for. One shuffle on user_id, one
    window, no inequality join (operators/temporal.py)."""
    from crawler_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    out = asof_join(purchases, signups, on="ts", by="user_id", value_cols=["ts"])
    # no-prior-signup rows keep NULL from the operator; the oracle-
    # checked projection pins them to the epoch (NULL timestamps render
    # as NaT on the pandas side of the compare)
    return out.select(
        "event_id", "user_id", "ts",
        F.coalesce("asof_ts", F.lit("1970-01-01 00:00:00").cast("timestamp"))
        .alias("asof_ts"),
    ).orderBy("event_id")


# --- range join: each user's events inside their first 24 hours -----------
@register(
    "range_first_day_events",
    oracle="""
        WITH firsts AS (
            SELECT user_id AS by_user, min(ts) AS lo,
                   min(ts) + INTERVAL 24 HOUR AS hi
            FROM events GROUP BY user_id
        )
        SELECT e.event_id, e.user_id, e.ts, f.lo, f.hi
        FROM events e JOIN firsts f ON e.user_id = f.by_user
        WHERE e.ts >= f.lo AND e.ts <= f.hi
        ORDER BY e.event_id
    """,
)
def range_first_day_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join (point BETWEEN lo AND hi) through the
    bucketed equi-join rewrite — no BroadcastNestedLoop. Here each key
    has one interval (a degenerate but real case: the user's first-day
    window); the bucketing pays off when keys carry many or wide
    intervals (ad campaigns, maintenance windows)."""
    from crawler_spark.operators.temporal import range_join_buckets

    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy(F.col("user_id").alias("by_user")).agg(
        F.min("ts").alias("lo"),
        (F.min("ts") + F.expr("INTERVAL 24 HOURS")).alias("hi"),
    )
    joined = range_join_buckets(
        ev.select("event_id", "user_id", "ts"),
        firsts.withColumnRenamed("by_user", "user_id"),
        point_t="ts", lo="lo", hi="hi", by="user_id",
    )
    return joined.select("event_id", "user_id", "ts", "lo", "hi").orderBy("event_id")


# --- interval attribution: clicks within 30 min before each purchase ------
@register(
    "ev_attribution_interval",
    oracle="""
        SELECT p.event_id, p.user_id,
               count(c.ts) AS n_clicks_30m
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id, ts FROM events
                   WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        GROUP BY p.event_id, p.user_id
    """,
)
def ev_attribution_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel attribution: for every purchase, how many clicks the same
    user made in the preceding 30 minutes — the interval-join twin of
    ``asof_last_signup`` (count all causes in a window, not just the
    latest one).

    Scale shape: the naive formulation is an inequality join, which
    Spark plans as BroadcastNestedLoop; this goes through
    ``range_join_buckets`` instead — purchases explode into the ≤2
    half-hour buckets their window overlaps, clicks hash to one bucket,
    and the exact BETWEEN refines after a plain (user, bucket)
    equi-join. Purchases with zero clicks survive via the left join
    back onto the purchase table (count carried as 0), so the output is
    one row per purchase regardless. The streaming twin is a
    stream-stream join with a 30-minute watermark on both sides —
    identical predicate, state bounded by the bucket width.
    """
    from crawler_spark.operators.temporal import range_join_buckets

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("hi"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("lo"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    matched = range_join_buckets(
        clicks, purchases, point_t="ts", lo="lo", hi="hi", by="user_id",
        bucket_width_sec=1800, keep=["p_id"],
    )
    counts = matched.groupBy("p_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        purchases.join(counts, "p_id", "left")
        .select(
            F.col("p_id").alias("event_id"),
            "user_id",
            F.coalesce("n", F.lit(0)).alias("n_clicks_30m"),
        )
    )


# --- interval×interval overlap join ---------------------------------------
@register(
    "ev_span_overlap",
    oracle="""
        WITH spans AS (
            SELECT user_id, event_type, min(ts) AS lo, max(ts) AS hi
            FROM events GROUP BY user_id, event_type
        )
        SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b,
               CAST(epoch_us(least(a.hi, b.hi))
                    - epoch_us(greatest(a.lo, b.lo)) AS BIGINT) AS overlap_us
        FROM spans a JOIN spans b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
         AND a.lo <= b.hi AND b.lo <= a.hi
    """,
)
def ev_span_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which of a user's per-event-type activity spans overlap, and by
    how much — the interval×interval overlap join
    (operators/temporal.py interval_overlap_join): both span sets
    explode into day buckets, equi-join on (user, bucket), exact
    predicate + canonical-bucket claim refine — no BroadcastNestedLoop,
    no distinct over the pair stream. The span derivation is one tiny
    aggregate; the operator is the point."""
    from crawler_spark.operators.temporal import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    a = spans.select("user_id", F.col("event_type").alias("type_a"),
                     F.col("lo").alias("a_lo"), F.col("hi").alias("a_hi"))
    b = spans.select("user_id", F.col("event_type").alias("type_b"),
                     F.col("lo").alias("b_lo"), F.col("hi").alias("b_hi"))
    joined = interval_overlap_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", by="user_id")
    return (
        joined.where(F.col("type_a") < F.col("type_b"))
        .select(
            "user_id", "type_a", "type_b",
            (F.unix_micros(F.least("a_hi", "b_hi"))
             - F.unix_micros(F.greatest("a_lo", "b_lo"))).alias("overlap_us"),
        )
    )
