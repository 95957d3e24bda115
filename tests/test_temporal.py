"""Unit tests for the temporal join operators (operators/temporal.py):
as-of tie/no-match/per-key isolation semantics, range-join bucket
boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


class TestAsofJoin:
    def test_backward_pick_tie_and_no_match(self, spark):
        from crawler_spark.operators.temporal import asof_join

        left = spark.createDataFrame(
            [(1, "u1", ts("2024-01-01T10:00:00")),   # after r2 → picks 09:00
             (2, "u1", ts("2024-01-01T08:00:00")),   # tie with r1 → 08:00 matches
             (3, "u1", ts("2024-01-01T07:00:00")),   # before all → NULL
             (4, "u2", ts("2024-01-01T12:00:00"))],  # other key → only its own
            "id long, user string, t timestamp",
        )
        right = spark.createDataFrame(
            [("u1", ts("2024-01-01T08:00:00"), 100),
             ("u1", ts("2024-01-01T09:00:00"), 200),
             ("u2", ts("2024-01-01T11:00:00"), 900)],
            "user string, t timestamp, val int",
        )
        got = {r.id: r.asof_val for r in asof_join(
            left, right, on="t", by="user", value_cols=["val"]).collect()}
        assert got == {1: 200, 2: 100, 3: None, 4: 900}

    def test_left_rows_and_columns_preserved(self, spark):
        from crawler_spark.operators.temporal import asof_join

        left = spark.createDataFrame(
            [(1, "u1", ts("2024-01-01T10:00:00"), "extra")],
            "id long, user string, t timestamp, note string",
        )
        right = spark.createDataFrame(
            [("u1", ts("2024-01-01T09:00:00"), 7)],
            "user string, t timestamp, val int",
        )
        rows = asof_join(left, right, on="t", by="user",
                         value_cols=["val"]).collect()
        assert len(rows) == 1
        assert rows[0].note == "extra" and rows[0].asof_val == 7

    def test_all_values_come_from_the_same_matched_row(self, spark):
        """merge_asof/DuckDB ASOF semantics: the matched right row's
        legitimate NULL must NOT be overridden by an older row's
        non-NULL, and multiple value columns must never mix rows."""
        from crawler_spark.operators.temporal import asof_join

        left = spark.createDataFrame(
            [(1, "u1", ts("2024-01-01T10:00:00"))],
            "id long, user string, t timestamp",
        )
        right = spark.createDataFrame(
            [("u1", ts("2024-01-01T08:00:00"), 100, "old"),
             ("u1", ts("2024-01-01T09:00:00"), None, "new")],
            "user string, t timestamp, val int, tag string",
        )
        row = asof_join(left, right, on="t", by="user",
                        value_cols=["val", "tag"]).collect()[0]
        # matched row is 09:00 → val is genuinely NULL, tag is 'new';
        # the broken per-column carry would return (100, 'new')
        assert row.asof_val is None and row.asof_tag == "new"

    def test_forward_direction_nearest_following(self, spark):
        """direction='forward' = merge_asof forward: nearest right row
        AT or AFTER the left timestamp; nothing after → NULL."""
        from crawler_spark.operators.temporal import asof_join

        left = spark.createDataFrame(
            [(1, "u1", ts("2024-01-01T10:00:00")),   # next is 11:00 → 300
             (2, "u1", ts("2024-01-01T08:00:00")),   # tie at 08:00 → 100
             (3, "u1", ts("2024-01-01T12:00:00"))],  # after all → NULL
            "id long, user string, t timestamp",
        )
        right = spark.createDataFrame(
            [("u1", ts("2024-01-01T08:00:00"), 100),
             ("u1", ts("2024-01-01T11:00:00"), 300)],
            "user string, t timestamp, val int",
        )
        got = {r.id: r.asof_val for r in asof_join(
            left, right, on="t", by="user", value_cols=["val"],
            direction="forward").collect()}
        assert got == {1: 300, 2: 100, 3: None}


class TestRangeJoinBuckets:
    def test_inclusive_bounds_and_bucket_crossing(self, spark):
        from crawler_spark.operators.temporal import range_join_buckets

        points = spark.createDataFrame(
            [(1, "k", ts("2024-01-01T00:00:00")),   # == lo: inclusive
             (2, "k", ts("2024-01-01T02:00:00")),   # == hi: inclusive
             (3, "k", ts("2024-01-01T02:00:01")),   # just past hi: out
             (4, "k", ts("2024-01-01T01:30:00")),   # inside, middle bucket
             (5, "x", ts("2024-01-01T01:00:00"))],  # wrong key: out
            "id long, k string, t timestamp",
        )
        intervals = spark.createDataFrame(
            [("k", ts("2024-01-01T00:00:00"), ts("2024-01-01T02:00:00"))],
            "k string, lo timestamp, hi timestamp",
        )
        got = sorted(
            r.id for r in range_join_buckets(
                points, intervals, point_t="t", lo="lo", hi="hi", by="k",
                bucket_width_sec=3600,
            ).collect()
        )
        assert got == [1, 2, 4]  # interval spans 3 buckets; bounds inclusive

    def test_matches_plain_join_filter(self, spark):
        """Bucketed rewrite ≡ the naive inequality join on real data."""
        from crawler_spark.operators.temporal import range_join_buckets
        from crawler_spark.sources import load_table

        ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
            "event_id", "user_id", "ts"
        )
        firsts = ev.groupBy("user_id").agg(
            F.min("ts").alias("lo"),
            (F.min("ts") + F.expr("INTERVAL 6 HOURS")).alias("hi"),
        )
        bucketed = {
            r.event_id
            for r in range_join_buckets(ev, firsts, "ts", "lo", "hi", "user_id",
                                        bucket_width_sec=900).collect()
        }
        naive = {
            r.event_id
            for r in ev.join(firsts, "user_id")
            .filter((F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")))
            .collect()
        }
        assert bucketed == naive and bucketed


class TestIntervalOverlapJoin:
    def test_matches_naive_inequality_join(self, spark):
        """Bucketed overlap join == naive crossJoin+predicate on random
        per-key intervals (including touching endpoints and intervals
        spanning many buckets), each pair exactly once."""
        import random

        from crawler_spark.operators.temporal import interval_overlap_join

        rng = random.Random(7)
        base = 1_700_000_000
        rows = []
        for i in range(120):
            lo = base + rng.randrange(0, 30 * 86400)
            rows.append((i, rng.randrange(3), lo, lo + rng.randrange(1, 5 * 86400)))
        mk = ("id long, k long, lo_s long, hi_s long")
        df = spark.createDataFrame(rows, mk).select(
            "id", "k",
            F.timestamp_seconds("lo_s").alias("lo"),
            F.timestamp_seconds("hi_s").alias("hi"))
        a = df.select(F.col("id").alias("a_id"), "k",
                      F.col("lo").alias("a_lo"), F.col("hi").alias("a_hi"))
        b = df.select(F.col("id").alias("b_id"), "k",
                      F.col("lo").alias("b_lo"), F.col("hi").alias("b_hi"))
        got = {(r.a_id, r.b_id) for r in interval_overlap_join(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", by="k",
            bucket_width_sec=86400).collect()}
        naive = {(x[0], y[0]) for x in rows for y in rows
                 if x[1] == y[1] and x[2] <= y[3] and y[2] <= x[3]}
        assert got == naive
        assert len(got) == len(naive)  # each pair exactly once (it's a set
        # both sides; row-level multiplicity checked below)
        rows_out = interval_overlap_join(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", by="k",
            bucket_width_sec=86400).collect()
        assert len(rows_out) == len(naive), "canonical-bucket claim emitted dupes"


class TestHoltLinear:
    def test_hand_computed_recursion(self, spark, tmp_path):
        """Python recomputation of the (level, trend) fold on a small
        single-user series written as an events table."""
        import datetime

        base = datetime.datetime(2026, 1, 1)
        vals = [1.0, 2.0, 4.0, 7.0, 11.0]
        rows = [
            (i, base + datetime.timedelta(minutes=i), 1, "view", v, None)
            for i, v in enumerate(vals)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))

        import __spark_entry__ as E

        got = {r.event_id: r for r in
               E.queries()["ev_holt_linear"](spark, str(tmp_path)).collect()}

        a, b = 0.5, 0.3
        for n in range(1, len(vals) + 1):
            window = vals[:n]
            l, t = window[0], 0.0
            for x in window[1:]:
                ln = a * x + (1 - a) * (l + t)
                t = b * (ln - l) + (1 - b) * t
                l = ln
            import math

            r = got[n - 1]
            assert r.level_u6 == math.floor(l * 1e6 + 0.5), (n, l, r)
            assert r.trend_u6 == math.floor(t * 1e6 + 0.5), (n, t, r)
            assert r.forecast_u6 == math.floor((l + t) * 1e6 + 0.5)

    def test_tracks_linear_series_exactly_in_the_limit(self, spark):
        """On a drifting series the one-step forecast must beat the
        EWMA-style trendless level: trend_u6 is positive for a rising
        user series on the fixture (sanity of the trend state)."""
        import __spark_entry__ as E

        rows = E.queries()["ev_holt_linear"](
            spark, "/root/testdata/sf0.001").collect()
        assert rows and any(r.trend_u6 != 0 for r in rows)
        for r in rows[:50]:
            assert r.forecast_u6 == r.level_u6 + r.trend_u6 or \
                abs(r.forecast_u6 - (r.level_u6 + r.trend_u6)) <= 1


class TestKMVSketch:
    def test_estimates_within_relative_error_on_crafted_overlap(
            self, spark, tmp_path):
        """Two types with known distinct sets: A = users 0..999,
        B = users 500..1499 → union 1500, intersection 500. The KMV
        estimates (k=64) must land within 3σ ≈ 40% relative error (theory:
        σ ≈ 1/√(k-2) ≈ 12.6%; this fixture draw sits at +30%, ~2.3σ —
        KMV at k=64 is a coarse instrument, which is the point of
        testing the BOUND, not the luck)."""
        import datetime

        base = datetime.datetime(2026, 1, 1)
        rows = []
        eid = 0
        for u in range(1000):
            rows.append((eid, base, u, "view", 1.0, None)); eid += 1
        for u in range(500, 1500):
            rows.append((eid, base, u, "click", 1.0, None)); eid += 1
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))

        import __spark_entry__ as E

        out = E.queries()["ev_kmv_distinct_intersect"](
            spark, str(tmp_path)).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.type_a, r.type_b) == ("click", "view")
        union = r.est_union_u6 / 1e6
        inter = r.est_intersect_u6 / 1e6
        assert abs(union - 1500) / 1500 < 0.4, union
        assert abs(inter - 500) / 500 < 0.4, inter

    def test_small_sets_are_exact(self, spark, tmp_path):
        """Sets smaller than k: the sketch IS the set — estimates are
        exact."""
        import datetime

        base = datetime.datetime(2026, 1, 1)
        rows = []
        eid = 0
        for u in range(20):
            rows.append((eid, base, u, "view", 1.0, None)); eid += 1
        for u in range(10, 40):
            rows.append((eid, base, u, "click", 1.0, None)); eid += 1
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.parquet(str(tmp_path / "events.parquet"))

        import __spark_entry__ as E

        r = E.queries()["ev_kmv_distinct_intersect"](
            spark, str(tmp_path)).collect()[0]
        assert r.est_union_u6 == 40_000_000      # 40 exactly
        assert r.est_intersect_u6 == 10_000_000  # 10 exactly


def test_asof_null_keys_never_match(spark):
    """NULL timestamps and NULL by-keys are non-matching on BOTH sides
    (merge_asof raises on them; DuckDB ASOF never matches NULL): a
    forward-direction left row with a NULL timestamp must not grab the
    chronologically first right row, and NULL by-keys must not pair
    with each other."""
    from crawler_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("u1", None), ("u1", 50), (None, 10)],
        "uid string, t long")
    right = spark.createDataFrame(
        [("u1", 100, "first"), ("u1", 200, "second"),
         (None, 5, "null-key"), ("u1", None, "null-ts")],
        "uid string, t long, val string")
    out = {(r.uid, r.t): r.asof_val for r in asof_join(
        left, right, on="t", by="uid", value_cols=["val"],
        direction="forward").collect()}
    assert out[("u1", 50)] == "first"      # genuine forward match
    assert out[("u1", None)] is None        # NULL ts: no spurious match
    assert out[(None, 10)] is None          # NULL key: no null-key pairing
