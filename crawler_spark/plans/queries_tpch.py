"""Generic relational surface over the TPC-H-ish testdata: joins,
aggregations, windows, rollup, set ops (SURVEY.md §2.3-2.7 plus the
driver-contract extensions — the reference itself has no joins, so
these define the engine's join/agg/window semantics).

Money arithmetic goes through exact DECIMAL so both engines produce
bit-identical doubles regardless of aggregation order (see
registry.py docstring). Decimal widths are chosen to stay under
DuckDB's 38-digit product limit: price DECIMAL(12,2) × factor
DECIMAL(9,2) × factor DECIMAL(9,2) → ≤ 30 digits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.plans.registry import register
from crawler_spark.sources import load_table


def _money(col: str) -> F.Column:
    return F.col(col).cast("decimal(12,2)")


def _one_minus(col: str) -> F.Column:
    # DECIMAL(8,2) - DECIMAL(8,2) → DECIMAL(9,2), exact
    return F.lit(1).cast("decimal(8,2)") - F.col(col).cast("decimal(8,2)")


def _one_plus(col: str) -> F.Column:
    return F.lit(1).cast("decimal(8,2)") + F.col(col).cast("decimal(8,2)")


# --- Q1: pricing summary (scan + 2-key groupBy + 8 aggregates) ------------
@register(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE)
                   AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2))) *
                        (CAST(1 AS DECIMAL(8,2)) + CAST(l_tax AS DECIMAL(8,2)))) AS DOUBLE)
                   AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = _money("l_extendedprice")
    disc_price = price * _one_minus("l_discount")
    charge = disc_price * _one_plus("l_tax")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum(qty).cast("double") / n).alias("avg_qty"),
        (F.sum(price).cast("double") / n).alias("avg_price"),
        (F.sum(F.col("l_discount").cast("decimal(8,2)")).cast("double") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


# --- Q3: shipping priority (3-way join + groupBy + top-k) -----------------
@register(
    "q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE)
                   AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1997-01-01 00:00:00").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    revenue = _money("l_extendedprice") * _one_minus("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# --- Q5: regional revenue (6-way join, dims broadcast) --------------------
@register(
    "q5_regional_revenue",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE)
                   AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    # dims chain: region ⨝ nation ⨝ supplier is tiny → broadcast to the facts
    dims = (
        supplier.join(
            F.broadcast(nation.join(F.broadcast(region),
                                    nation.n_regionkey == region.r_regionkey)),
            supplier.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    revenue = _money("l_extendedprice") * _one_minus("l_discount")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .join(customer.select("c_custkey", "c_nationkey"),
              (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# --- Q6: forecast revenue change (pushdown-friendly scan + 1-row agg) -----
@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.04
          AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.02, 0.04))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_money("l_extendedprice") * F.col("l_discount").cast("decimal(8,2)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- Q10-ish: top returned-revenue customers ------------------------------
@register(
    "q10_returned_revenue",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE)
                   AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    revenue = _money("l_extendedprice") * _one_minus("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# --- semi join: customers having an open order (EXISTS) -------------------
@register(
    "join_semi_open_orders",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
)
def join_semi_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    open_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(open_orders, "c_custkey", "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


# --- anti join: customers with no orders at all (reference S12 delete) ----
@register(
    "join_anti_no_orders",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    """,
)
def join_anti_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (S12 delete shape): customers with no RECENT orders —
    every testdata customer has some order, so the unscoped variant
    matched zero rows and proved nothing."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(orders, "c_custkey", "left_anti").select("c_custkey", "c_name")


# --- W1: top-3 orders per customer (rank window + filter) -----------------
@register(
    "w1_top3_orders_per_customer",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
)
def w1_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
    )


# --- W2: running revenue per supplier (frame window, exact decimal) -------
@register(
    "w2_running_revenue_per_supplier",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2))))
                    OVER (PARTITION BY l_suppkey
                          ORDER BY l_shipdate, l_orderkey, l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS running_revenue
        FROM lineitem
    """,
)
def w2_running_revenue_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    revenue = _money("l_extendedprice") * _one_minus("l_discount")
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate",
                "l_extendedprice", "l_discount")
        .withColumn("running_revenue", F.sum(revenue).over(w).cast("double"))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_revenue")
    )


# --- W3: analytic functions — lag gaps, percent_rank, ntile ---------------
@register(
    "w3_order_gaps_and_ranks",
    oracle="""
        SELECT o_custkey, o_orderkey,
               coalesce(date_diff('day',
                         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey),
                         o_orderdate), -1) AS gap_days,
               round(percent_rank() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice, o_orderkey), 6)
                   AS price_pct,
               CAST(ntile(4) OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice, o_orderkey) AS BIGINT)
                   AS quartile
        FROM orders
    """,
)
def w3_order_gaps_and_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function coverage beyond ranking/frames: lag + date
    arithmetic (days since the customer's previous order), percent_rank
    and ntile over a tie-broken price ordering — two window specs, one
    shuffle on o_custkey (both windows share the partition key, so
    Catalyst evaluates them in one Window node pair without a second
    exchange)."""
    by_date = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    by_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .select(
            "o_custkey", "o_orderkey",
            F.coalesce(
                F.datediff("o_orderdate", F.lag("o_orderdate").over(by_date)),
                F.lit(-1),
            ).cast("bigint").alias("gap_days"),  # -1 = first order (NULL lag)
            F.round(F.percent_rank().over(by_price), 6).alias("price_pct"),
            F.ntile(4).over(by_price).cast("bigint").alias("quartile"),
        )
    )


# --- rollup: order counts by priority/status hierarchy --------------------
@register(
    "rollup_order_counts",
    oracle="""
        SELECT o_orderpriority, o_orderstatus, count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
)
def rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_money("o_totalprice")).cast("double").alias("total"),
        )
    )


# --- set ops: INTERSECT / EXCEPT over customer keys -----------------------
@register(
    "setop_intersect",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.intersect(f)


@register(
    "setop_except",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.subtract(f)
