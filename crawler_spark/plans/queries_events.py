"""Event-time analytics over the ``events`` table (SURVEY.md §2.11 and
§7 M5): tumbling windows, sessionization, JSON extraction. These are
the batch twins of the Structured Streaming operators in
``crawler_spark/streaming/`` — same semantics, so the streaming path
can be validated against the oracle-checked batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.plans.oracle_pins import pin_kwargs as _PINS_KW
from crawler_spark.plans.registry import register
from crawler_spark.sources import load_table

SESSION_GAP_MIN = 30


# --- tumbling 1-hour window aggregate -------------------------------------
@register(
    "ev_tumbling_hourly",
    oracle="""
        SELECT date_trunc('hour', ts) AS bucket_start, event_type,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
)
def ev_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window via ``F.window`` — identical semantics to
    date_trunc for 1-hour tumble; written with window() so the same
    expression lifts to Structured Streaming unchanged."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("bucket_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# --- sliding 1-hour window, 30-min slide ----------------------------------
@register(
    "ev_sliding_hourly",
    oracle="""
        WITH slides AS (
            SELECT value,
                   time_bucket(INTERVAL '30 minutes', ts)
                       - s.off * INTERVAL 1 MINUTE AS win_start
            FROM events e, (SELECT unnest([0, 30]) AS off) s
        )
        SELECT win_start, count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        FROM slides GROUP BY 1
    """,
)
def ev_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min: each event lands in 2
    windows. ``F.window(ts, '1 hour', '30 minutes')`` explodes to the
    matching windows natively."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("window.start").alias("win_start"), "n", "total_value")
    )


# --- sessionization: 30-min-gap sessions per user -------------------------
@register(
    "ev_sessionize",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               count(*) AS n_events, min(ts) AS session_start,
               max(ts) AS session_end
        FROM numbered GROUP BY user_id, session_id
    """,
)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap flag + running sum = session id.
    The streaming twin is ``session_window(ts, gap)`` (streaming/)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) > gap_us),
        1,
    ).otherwise(0)
    numbered = ev.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# --- JSON extraction from the props column --------------------------------
@register(
    "ev_json_extract",
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
               count(*) AS n
        FROM events GROUP BY 1
    """,
)
def ev_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint") % 10
    return ev.groupBy(k.alias("k_bucket")).agg(F.count(F.lit(1)).alias("n"))


# --- D6-ish: per-type daily funnel (state-machine counts over time) -------
@register(
    "ev_daily_funnel",
    oracle="""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               count(CASE WHEN event_type = 'view' THEN 1 END) AS views,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
               count(CASE WHEN event_type = 'signup' THEN 1 END) AS signups,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS errors
        FROM events GROUP BY 1
    """,
)
def ev_daily_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass conditional aggregation — the engine's version of the
    reference dashboard's four separate status-count queries
    (reference search.py:20-44) generalized to a funnel."""
    ev = load_table(spark, sf_dir, "events")

    def cnt(t: str) -> F.Column:
        # count(CASE WHEN ...) — BIGINT in both engines (DuckDB's SUM of
        # INTEGER would come back HUGEINT and fail the schema compare)
        return F.count(F.when(F.col("event_type") == t, 1))

    # day as a plain string: DATE columns round-trip differently through
    # the two engines' pandas bridges (DuckDB promotes to datetime64)
    return ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        cnt("view").alias("views"),
        cnt("click").alias("clicks"),
        cnt("signup").alias("signups"),
        cnt("purchase").alias("purchases"),
        cnt("error").alias("errors"),
    )


# --- pivot: wide daily counts per event type ------------------------------
@register(
    "ev_pivot_daily_counts",
    oracle="""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS view
        FROM events
        GROUP BY 1 ORDER BY 1
    """,
)
def ev_pivot_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT long→wide: one row per day, one column per event type.
    The value list is passed explicitly, which (a) skips the extra
    distinct-values job Spark otherwise runs at plan time and (b) pins
    the output schema — both mandatory habits at 100 TB (a pivot over
    unvalidated distinct values is an unbounded-width schema bomb).
    Physically this is the same single Expand+aggregate as the
    conditional-sum form the oracle uses."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", types)
        .count()
        .orderBy("day")
    )
    # pivot yields nullable counts (a day with zero signups) — the
    # conditional-sum oracle yields 0; align on 0
    return out.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t) for t in types]
    )


@register(
    "ev_unpivot_roundtrip",
    oracle="""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               event_type, count(*) AS n
        FROM events
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ev_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) wide→long: the inverse of ev_pivot_daily_counts,
    proving the pair round-trips back to the plain long aggregate the
    oracle computes directly. Zero-count cells are dropped on the way
    back (the long form has no row for a day×type that never
    happened)."""
    wide = ev_pivot_daily_counts(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        wide.unpivot("day", types, "event_type", "n")
        .filter(F.col("n") > 0)
        .orderBy("day", "event_type")
    )


# --- retention: week-over-week returning users ----------------------------
@register(
    "ev_weekly_retention",
    oracle="""
        WITH wu AS (
            SELECT DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk,
                   user_id
            FROM events
        ),
        cur AS (SELECT wk, count(*) AS n_users FROM wu GROUP BY wk),
        ret AS (
            SELECT a.wk, count(*) AS retained
            FROM wu a JOIN wu b
              ON b.user_id = a.user_id AND b.wk = a.wk + INTERVAL 7 DAY
            GROUP BY a.wk
        )
        SELECT cur.wk AS week_start, n_users,
               coalesce(retained, 0) AS retained,
               round(CAST(coalesce(retained, 0) AS DOUBLE) / n_users, 6)
                   AS retention_rate
        FROM cur LEFT JOIN ret ON ret.wk = cur.wk
        ORDER BY week_start
    """,
)
def ev_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: of each week's distinct active users, the
    fraction active again the following week. One distinct (week,user)
    projection feeds both sides of a self-join shifted by 7 days —
    shuffles on user_id (high-cardinality, uniform), then a tiny
    per-week aggregate. The classic growth-analytics query the
    reference's dashboard would want next."""
    ev = load_table(spark, sf_dir, "events")
    wu = ev.select(
        F.date_trunc("week", "ts").alias("wk"), "user_id"
    ).distinct()
    cur = wu.groupBy("wk").agg(F.count(F.lit(1)).alias("n_users"))
    nxt = wu.select((F.col("wk") - F.expr("INTERVAL 7 DAYS")).alias("wk"), "user_id")
    ret = (
        wu.join(nxt, ["wk", "user_id"])
        .groupBy("wk")
        .agg(F.count(F.lit(1)).alias("retained"))
    )
    return (
        cur.join(ret, "wk", "left")
        .select(
            F.col("wk").alias("week_start"),
            "n_users",
            F.coalesce("retained", F.lit(0)).alias("retained"),
            F.round(
                F.coalesce("retained", F.lit(0)).cast("double") / F.col("n_users"), 6
            ).alias("retention_rate"),
        )
        .orderBy("week_start")
    )


# --- mergeable-sketch distinct counting (the 100 TB COUNT DISTINCT) -------
# seeded-deterministic, partition-independent — sf0.01
# REGRESSION pin (tools/pin_oracles.py); was: rows-only: HLL estimates have no exact SQL twin
@register("ev_hll_distinct_rollup", **_PINS_KW("ev_hll_distinct_rollup"))
def ev_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct users via MERGEABLE HLL sketches: one pass builds
    per-day sketches (``hll_sketch_agg`` — map-side partial, a few KB
    per day regardless of row count), then the weekly rollup merges
    SKETCHES (``hll_union_agg``) without re-touching raw events. This
    is the scale shape for distinct counting: exact COUNT(DISTINCT)
    re-shuffles the full key set for every new grain, while sketch
    rollups reduce kilobytes — daily → weekly → all-time compose for
    free. tests/test_mlprep.py pins every estimate within 5% of the
    exact per-week distinct count and merge-of-daily == direct-weekly."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    weekly = daily.groupBy(F.date_trunc("week", "day").alias("week_start")).agg(
        F.hll_union_agg("sk").alias("wsk"),
        F.sum("n_events").alias("n_events"),
    )
    return weekly.select(
        "week_start",
        F.hll_sketch_estimate("wsk").alias("approx_users"),
        F.col("n_events").cast("bigint").alias("n_events"),
    ).orderBy("week_start")


# --- trailing event-time window features (ML feature engineering) ---------
@register(
    "ev_trailing_features",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(count(*) OVER w AS BIGINT) AS n_7d,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 6)
                   AS sum_value_7d
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    """,
)
def ev_trailing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-7-day activity features (count and value sum
    over the user's preceding week, inclusive) — the standard
    point-in-time feature-engineering shape, leakage-free by
    construction (the frame never looks forward). One shuffle on
    user_id; the RANGE frame is expressed over epoch micros so both
    engines bound it identically, and the sum goes through decimal so
    partial-aggregation order cannot perturb the float."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 24 * 3600 * 1_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", "ts",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double"), 6
        ).alias("sum_value_7d"),
    )


# --- per-event anomaly score vs user-lifetime stats -----------------------
@register(
    "ev_anomaly_zscore",
    oracle="""
        WITH stats AS (
            SELECT user_id,
                   avg(value) AS mu,
                   stddev_samp(value) AS sigma,
                   count(*) AS n
            FROM events GROUP BY user_id
        )
        SELECT e.event_id, e.user_id,
               round(CASE WHEN s.n >= 2 AND s.sigma > 0
                          THEN (e.value - s.mu) / s.sigma END, 6) AS zscore
        FROM events e JOIN stats s USING (user_id)
    """,
)
def ev_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event z-score against the user's lifetime value
    distribution — the simplest distributed anomaly signal: one tiny
    per-user aggregate broadcast back onto the event stream (no second
    corpus shuffle), NULL where the user lacks a defined deviation.
    Both engines use sample stddev; the score is rounded and the
    THRESHOLD decision is left to callers (a flag at z>k would hinge
    on last-ulp float agreement)."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        ev.join(F.broadcast(stats), "user_id")
        .select(
            "event_id", "user_id",
            F.round(
                F.when((F.col("n") >= 2) & (F.col("sigma") > 0),
                       (F.col("value") - F.col("mu")) / F.col("sigma")), 6
            ).alias("zscore"),
        )
    )


# --- multi-step in-order funnel (view -> click -> purchase) ---------------
@register(
    "ev_funnel_sequence",
    oracle="""
        WITH a AS (
            SELECT user_id, min(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        b AS (
            SELECT e.user_id, min(e.ts) AS t_click
            FROM events e JOIN a USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > a.t_view
            GROUP BY e.user_id
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS t_purchase
            FROM events e JOIN b USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > b.t_click
            GROUP BY e.user_id
        )
        SELECT a.user_id, a.t_view, b.t_click, c.t_purchase,
               (b.user_id IS NOT NULL) AS reached_click,
               (c.user_id IS NOT NULL) AS reached_purchase
        FROM a LEFT JOIN b USING (user_id) LEFT JOIN c USING (user_id)
    """,
)
def ev_funnel_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: the user's first view, first click AFTER
    that view, first purchase AFTER that click — the sequence-matching
    funnel (out-of-order events never count, unlike the daily funnel's
    per-day tallies). Each stage is one filtered per-user min joined
    forward; all three stage tables are user-cardinality, so the two
    stage joins broadcast and the event table is scanned once per
    stage with the type filter pushed down."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view"))
    b = (
        ev.where(F.col("event_type") == "click")
        .join(F.broadcast(a), "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    c = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(b), "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id").agg(F.min("ts").alias("t_purchase"))
    )
    return (
        a.join(b, "user_id", "left").join(c, "user_id", "left")
        .select(
            "user_id", "t_view", "t_click", "t_purchase",
            F.col("t_click").isNotNull().alias("reached_click"),
            F.col("t_purchase").isNotNull().alias("reached_purchase"),
        )
    )


# --- event-type affinity (basket analysis over user behavior) -------------
@register(
    "ev_type_affinity",
    oracle="""
        WITH baskets AS (
            SELECT user_id, list_sort(list(DISTINCT event_type)) AS types
            FROM events GROUP BY user_id
        ),
        n AS (SELECT count(*) AS n_users FROM baskets),
        singles AS (
            SELECT t, count(*) AS c
            FROM (SELECT unnest(types) AS t FROM baskets)
            GROUP BY t
        ),
        pairs AS (
            SELECT a.t AS type_a, b.t AS type_b, count(*) AS co
            FROM (SELECT user_id, unnest(types) AS t FROM baskets) a
            JOIN (SELECT user_id, unnest(types) AS t FROM baskets) b
              ON a.user_id = b.user_id AND a.t < b.t
            GROUP BY 1, 2
        )
        SELECT type_a, type_b, CAST(co AS BIGINT) AS co_users,
               round(CAST(co AS DOUBLE) * n_users / (sa.c * sb.c), 6) AS lift
        FROM pairs
        JOIN singles sa ON sa.t = type_a
        JOIN singles sb ON sb.t = type_b
        CROSS JOIN n
    """,
)
def ev_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity between event types: for every type pair,
    how many users exhibit both and the lift over independence. The
    per-user basket is a collect_set (bounded by the type vocabulary,
    not event count); pairs explode from each basket in-plan (≤ |V|²/2
    per user, |V|=5 here) so no self-join of the event stream ever
    happens — one shuffle to build baskets, one vocabulary-sized
    aggregate after."""
    ev = load_table(spark, sf_dir, "events")
    baskets = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("types"))
    n_users = baskets.agg(F.count(F.lit(1)).alias("n_users"))
    singles = baskets.select(F.explode("types").alias("t")).groupBy("t").agg(
        F.count(F.lit(1)).alias("c"))
    pair_arr = F.filter(
        F.flatten(F.transform(
            "types",
            lambda x: F.transform("types", lambda y: F.struct(
                x.alias("type_a"), y.alias("type_b"))),
        )),
        lambda p: p["type_a"] < p["type_b"],
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.type_a").alias("type_a"), F.col("p.type_b").alias("type_b"))
        .agg(F.count(F.lit(1)).alias("co_users"))
    )
    sa = singles.select(F.col("t").alias("type_a"), F.col("c").alias("ca"))
    sb = singles.select(F.col("t").alias("type_b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a", "type_b", "co_users",
            F.round(
                F.col("co_users").cast("double") * F.col("n_users")
                / (F.col("ca") * F.col("cb")), 6,
            ).alias("lift"),
        )
    )


# --- hourly resample with forward-fill (gap-filled time series) -----------
@register(
    "ev_resample_ffill",
    oracle="""
        WITH bounds AS (
            SELECT user_id,
                   time_bucket(INTERVAL 1 HOUR, min(ts)) AS lo,
                   time_bucket(INTERVAL 1 HOUR, max(ts)) AS hi
            FROM events WHERE user_id < 100 GROUP BY user_id
        ),
        grid AS (
            SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                       AS bucket
            FROM bounds
        ),
        hourly AS (
            SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
                   round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
                       AS v
            FROM events WHERE user_id < 100 GROUP BY 1, 2
        )
        SELECT g.user_id, g.bucket,
               round(last_value(h.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS UNBOUNDED PRECEDING), 6) AS v_ffill,
               (h.user_id IS NOT NULL) AS observed
        FROM grid g LEFT JOIN hourly h
          ON g.user_id = h.user_id AND g.bucket = h.bucket
    """,
)
def ev_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize an irregular event series onto an hourly grid with
    forward-fill — the resample step every time-series feature pipeline
    needs and Spark has no built-in for. The grid generates in-plan
    (sequence over each user's [first, last] hour — no driver loop, no
    calendar table), observed hours left-join onto it, and one ordered
    window per user carries the last observed value forward. Restricted
    to user_id < 100 to keep grid rows bounded in the oracle run; the
    plan shape is user-count invariant (one shuffle for the hourly agg,
    one window on the same key)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 100)
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("v"))
    )
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket"),
    )
    joined = grid.join(
        hourly.withColumnRenamed("user_id", "h_user"),
        (grid.user_id == F.col("h_user")) & (grid.bucket == hourly.bucket),
        "left",
    ).select(grid.user_id, grid.bucket, "v", F.col("h_user").isNotNull().alias("observed"))
    w = (
        Window.partitionBy("user_id").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id", "bucket",
        F.round(F.last("v", ignorenulls=True).over(w), 6).alias("v_ffill"),
        "observed",
    )


# --- EWMA over the trailing value window ----------------------------------
_EWMA_ALPHA = 0.2
_EWMA_LOOKBACK = 20


@register(
    "ev_ewma",
    oracle=f"""
        SELECT event_id, user_id,
               round(list_reduce(
                   list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN {_EWMA_LOOKBACK - 1} PRECEDING
                                 AND CURRENT ROW),
                   (acc, x) -> CAST({_EWMA_ALPHA} AS DOUBLE) * x
                               + CAST({1 - _EWMA_ALPHA} AS DOUBLE) * acc),
                   6) AS ewma
        FROM events
    """,
)
def ev_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of each user's value
    series (trailing {n}-row window). EWMA is recursive, which no
    window frame expresses directly — instead the frame's values fold
    through a higher-order aggregate seeded with the oldest value
    (acc = αx + (1-α)acc). Both engines fold the identical order with
    identical +/* ops, so the doubles agree bit-for-bit before the
    courtesy round. Lookback bounds per-row state; one shuffle on
    user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_LOOKBACK - 1), Window.currentRow)
    )
    arr = F.collect_list("value").over(w)
    a = F.lit(float(_EWMA_ALPHA))
    ewma = F.aggregate(
        F.slice(arr, F.lit(2), F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        lambda acc, x: a * x + (F.lit(1.0) - a) * acc,
    )
    return ev.select("event_id", "user_id", F.round(ewma, 6).alias("ewma"))


# --- Holt's linear (double-exponential) smoothing -------------------------
_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3
_HOLT_LOOKBACK = 20


@register(
    "ev_holt_linear",
    oracle=f"""
        SELECT event_id, user_id,
               CAST(floor(st[1] * 1e6 + 0.5) AS BIGINT) AS level_u6,
               CAST(floor(st[2] * 1e6 + 0.5) AS BIGINT) AS trend_u6,
               CAST(floor((st[1] + st[2]) * 1e6 + 0.5) AS BIGINT)
                   AS forecast_u6
        FROM (
            SELECT event_id, user_id,
                   list_reduce(
                       list_transform(
                           list(value) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN {_HOLT_LOOKBACK - 1} PRECEDING
                                        AND CURRENT ROW),
                           x -> [CAST(x AS DOUBLE), CAST(0.0 AS DOUBLE)]),
                       -- acc = [level, trend]; a STRUCT accumulator here
                       -- hits a DuckDB 1.0 aliasing bug (the second
                       -- field reads the first field's already-updated
                       -- value), so the state rides a 2-list instead
                       (acc, x) -> [
                           CAST({_HOLT_ALPHA} AS DOUBLE) * x[1]
                               + CAST({1 - _HOLT_ALPHA} AS DOUBLE)
                                 * (acc[1] + acc[2]),
                           CAST({_HOLT_BETA} AS DOUBLE)
                               * ((CAST({_HOLT_ALPHA} AS DOUBLE) * x[1]
                               + CAST({1 - _HOLT_ALPHA} AS DOUBLE)
                                 * (acc[1] + acc[2])) - acc[1])
                               + CAST({1 - _HOLT_BETA} AS DOUBLE) * acc[2]
                       ]) AS st
            FROM events
        )
    """,
)
def ev_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend (double-exponential) smoothing over each
    user's trailing value window — EWMA's big sibling: the state is
    (level, trend), so the one-step forecast level+trend tracks
    drifting series where EWMA lags. Same recursion-as-fold trick as
    ``ev_ewma`` (no window frame expresses recursion): the frame's
    values fold through a struct accumulator seeded (l=x₁, b=0), and
    both engines run the identical op sequence so the doubles agree
    bit-for-bit before the courtesy round. Lookback bounds the
    per-row fold; one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-(_HOLT_LOOKBACK - 1), Window.currentRow)
    )
    arr = F.collect_list("value").over(w)
    a, b = F.lit(float(_HOLT_ALPHA)), F.lit(float(_HOLT_BETA))

    def step(acc, x):
        lnew = a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
        bnew = b * (lnew - acc["l"]) + (F.lit(1.0) - b) * acc["b"]
        return F.struct(lnew.alias("l"), bnew.alias("b"))

    st = F.aggregate(
        F.slice(arr, F.lit(2), F.greatest(F.size(arr) - 1, F.lit(0))),
        F.struct(
            F.element_at(arr, 1).cast("double").alias("l"),
            F.lit(0.0).alias("b"),
        ),
        step,
    )
    def u6(col):
        # micro-unit quantization via floor(x*1e6 + 0.5): the same IEEE
        # ops in both engines give the same integer, where round(x, 6)
        # diverges on half-boundaries (Spark rounds via exact BigDecimal,
        # DuckDB via scaled-double arithmetic)
        return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long")

    return ev.select(
        "event_id", "user_id",
        u6(st["l"]).alias("level_u6"),
        u6(st["b"]).alias("trend_u6"),
        u6(st["l"] + st["b"]).alias("forecast_u6"),
    )


# --- KMV sketch: distinct-intersection estimation -------------------------
_KMV_K = 64
_KMV_SCALE = float(1 << 60)
# 60-bit uniform hash both engines compute identically (15 md5 hex chars)
_KMV_H_SQL = "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"


def kmv_sketches(ev: DataFrame) -> DataFrame:
    """Per-type KMV bottom-k sketch (see ev_kmv_distinct_intersect).

    NULL user_id hashes to NULL. Ranking NULLS LAST makes one rule
    serve two review findings at zero extra plan cost: a NULL can
    only hold a bottom-k slot when the type has fewer than k distinct
    non-null hashes (so it never evicts a real k-th minimum), and a
    type whose user_ids are ALL NULL keeps its rn = 1 NULL row —
    collect_list skips NULLs, so that type emits the
    (type, empty-sketch) row the oracle's GROUP BY + list_distinct
    produces, instead of disappearing behind a pre-rank filter
    (edge pinned in tests/test_properties.py)."""
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w_rank = Window.partitionBy("event_type").orderBy(
        F.col("h").asc_nulls_last()
    )
    return (
        ev.select("event_type", h.alias("h"))
        .dropDuplicates(["event_type", "h"])
        .withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= _KMV_K)
        .groupBy("event_type")
        .agg(F.array_sort(F.collect_list("h")).alias("kmv"))
    )


@register(
    "ev_kmv_distinct_intersect",
    oracle=f"""
        WITH sk AS (
            SELECT event_type,
                   list_sort(list_distinct(list({_KMV_H_SQL})))[1:{_KMV_K}]
                       AS kmv
            FROM events
            GROUP BY event_type
        ),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   a.kmv AS ka, b.kmv AS kb,
                   list_sort(list_distinct(a.kmv || b.kmv))[1:{_KMV_K}] AS ku
            FROM sk a JOIN sk b ON a.event_type < b.event_type
        )
        SELECT type_a, type_b,
               CAST(floor(
                   CASE WHEN len(ku) < {_KMV_K} THEN CAST(len(ku) AS DOUBLE)
                        ELSE ({_KMV_K} - 1)
                             / (CAST(ku[{_KMV_K}] AS DOUBLE) / {_KMV_SCALE!r})
                   END * 1e6 + 0.5) AS BIGINT) AS est_union_u6,
               CAST(floor(
                   (CAST(len(list_filter(ku,
                        v -> list_contains(ka, v) AND list_contains(kb, v)))
                         AS DOUBLE) / len(ku))
                   * CASE WHEN len(ku) < {_KMV_K} THEN CAST(len(ku) AS DOUBLE)
                          ELSE ({_KMV_K} - 1)
                               / (CAST(ku[{_KMV_K}] AS DOUBLE) / {_KMV_SCALE!r})
                     END * 1e6 + 0.5) AS BIGINT) AS est_intersect_u6
        FROM pairs
        ORDER BY type_a, type_b
    """,
)
def ev_kmv_distinct_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) sketch per event type, with
    DISTINCT-INTERSECTION estimates across type pairs — the set
    operation HLL cannot do (HLL only unions; `ev_hll_distinct_rollup`
    covers that side). Theory: the k smallest of n uniform hashes sit
    at ≈ k/n, so distinct ≈ (k-1)/x_k (Beyer et al., SIGMOD'07); the
    union sketch is the bottom-k of the merged sketches, and the
    fraction of union-sketch members present in BOTH input sketches
    estimates Jaccard, giving |A∩B| ≈ J·|A∪B|.

    Everything is deterministic: the hash is md5-derived (identical in
    both engines, the CMS convention), sketches are sorted bottom-k
    arrays, and outputs are micro-unit quantized (the Holt convention)
    so no rounding boundary can split the engines. Scale shape:
    distinct (type, hash) pairs (map-side-combined dedup), then a
    rank-per-type window whose ``rn <= k`` filter pushes down as
    WindowGroupLimit — a map-side per-key bottom-k, so the hottest
    event type ships at most k rows per map partition — and a final
    collect of exactly ≤k longs per type. An earlier form sliced a
    ``collect_set`` AFTER aggregation, which buffered the FULL
    distinct-user set of the hottest type in one aggregation buffer —
    the docstring claimed bounded state the plan didn't have
    (review-found; the operators/sketch.py bottom-k discipline, now
    applied here and plan-locked). The pair stage joins T sketch rows,
    T = type cardinality."""
    sk = kmv_sketches(load_table(spark, sf_dir, "events"))
    a = sk.select(F.col("event_type").alias("type_a"), F.col("kmv").alias("ka"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("kmv").alias("kb"))
    pairs = a.join(b, F.col("type_a") < F.col("type_b")).withColumn(
        "ku", F.slice(F.array_sort(F.array_union("ka", "kb")), 1, _KMV_K))

    def est_card(ku):
        return F.when(
            F.size(ku) < _KMV_K, F.size(ku).cast("double")
        ).otherwise(
            F.lit(float(_KMV_K - 1))
            / (F.element_at(ku, _KMV_K).cast("double") / F.lit(_KMV_SCALE))
        )

    def u6(col):
        return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long")

    in_both = F.size(F.filter(
        "ku",
        lambda v: F.array_contains("ka", v) & F.array_contains("kb", v),
    ))
    jacc = in_both.cast("double") / F.size("ku")
    return pairs.select(
        "type_a", "type_b",
        u6(est_card(F.col("ku"))).alias("est_union_u6"),
        u6(jacc * est_card(F.col("ku"))).alias("est_intersect_u6"),
    ).orderBy("type_a", "type_b")


# --- incremental rollup maintenance (IVM) ---------------------------------
@register(
    "ev_rollup_incremental",
    oracle="""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               event_type,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def ev_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance, oracle-proven: the daily rollup
    is maintained by aggregating ONLY the newest day's rows and
    merging them into the standing rollup (re-aggregate of the union —
    counts and decimal sums are mergeable partial states), while the
    ORACLE recomputes the whole rollup from scratch. Hash equality is
    the IVM correctness proof: maintain == recompute. This is the
    pattern that turns an O(history) nightly job into O(new data) —
    at 100 TB the standing rollup is days×types rows (tiny) and the
    incremental agg touches one day's partition; the same merge works
    for HLL sketches (`ev_hll_distinct_rollup` is the distinct-count
    twin). Money math per the registry rule: DECIMAL partials, one
    final cast to DOUBLE after the merge."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type",
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    last_day = ev.agg(F.max("day").alias("d"))
    # NULL-day rows (NULL ts) must flow into SOME side or maintain !=
    # recompute: `day < d` is NULL for them and a plain filter drops
    # the row entirely while the oracle's GROUP BY keeps a NULL group.
    history = ev.join(
        F.broadcast(last_day),
        (ev["day"] < F.col("d")) | ev["day"].isNull()).drop("d")
    batch = ev.join(F.broadcast(last_day), ev["day"] == F.col("d")).drop("d")
    standing = history.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    delta = batch.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    return (
        standing.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(F.sum("n").alias("n"),
             F.sum("s").cast("double").alias("sum_value"))
    )
