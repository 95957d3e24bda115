"""Extended TPC-H-ish relational coverage, adapted to the driver's
slimmed schema (no partsupp; lineitem lacks shipmode/commitdate/
receiptdate — adapted variants noted per query).

Widens the operator surface beyond queries_tpch.py: correlated scalar
subqueries (argmin/argmax per group), multi-nation join chains with
conditional aggregation, ratio-of-sums market share, left-outer double
aggregation (distribution), HAVING over a grouped subquery, disjunctive
broadcast-join predicates, NOT EXISTS with scalar-subquery threshold,
and CUBE / GROUPING SETS.

Determinism: money math in exact DECIMAL, final cast to DOUBLE (see
registry.py). Ratio outputs divide two exact decimal sums in f64 —
identical in both engines. All LIMIT queries sort with unique
tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.plans.registry import register
from crawler_spark.sources import load_table


def _money(col: str) -> F.Column:
    return F.col(col).cast("decimal(12,2)")


def _one_minus(col: str) -> F.Column:
    return F.lit(1).cast("decimal(8,2)") - F.col(col).cast("decimal(8,2)")


_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))"


# --- Q2-adapted: cheapest part per type (correlated scalar subquery) ------
@register(
    "q2_min_cost_part",
    oracle="""
        SELECT p_type, p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                               WHERE p2.p_type = part.p_type)
        ORDER BY p_type, p_partkey
    """,
)
def q2_min_cost_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape without partsupp: argmin join — the correlated
    MIN decorrelates to a tiny per-type aggregate broadcast back to the
    scan (no shuffle of `part` itself)."""
    part = load_table(spark, sf_dir, "part")
    mins = part.groupBy(F.col("p_type").alias("mt")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(
            F.broadcast(mins),
            (part.p_type == F.col("mt")) & (part.p_retailprice == F.col("min_price")),
        )
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_type", "p_partkey")
    )


# --- Q7: volume shipping between two nations ------------------------------
@register(
    "q7_volume_shipping",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(volume) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   EXTRACT(year FROM l_shipdate) AS l_year,
                   {_REV} AS volume
            FROM supplier, lineitem, orders, customer, nation n1, nation n2
            WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
              AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
              AND c_nationkey = n2.n_nationkey
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic Q7: both nation dims broadcast; the only shuffle is
    lineitem⨝orders on orderkey and the final 3-key aggregate."""
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("c_nk"),
                                  F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "cust_nation")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")

    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    volume = _money("l_extendedprice") * _one_minus("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(volume).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q8: market share of one nation in a region ---------------------------
@register(
    "q8_market_share",
    oracle=f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                             ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        FROM (
            SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                   {_REV} AS volume,
                   n2.n_name AS supp_nation
            FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
            WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
              AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
              AND p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-of-sums with conditional aggregation; every dimension side
    (part filter, supplier→nation, customer→nation→region) broadcasts,
    so the plan is one lineitem⨝orders shuffle + a tiny agg."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    cust_region = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation.join(F.broadcast(region),
                                      nation.n_regionkey == region.r_regionkey)),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )

    volume = (_money("l_extendedprice") * _one_minus("l_discount")).alias("volume")
    branch = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(22,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"))
        .select(F.year("o_orderdate").alias("o_year"), volume, "supp_nation")
        .groupBy("o_year")
        .agg(
            (F.sum(branch).cast("double") / F.sum("volume").cast("double")).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- Q9-adapted: profit by nation and year (retailprice as cost) ----------
@register(
    "q9_nation_profit",
    oracle="""
        SELECT n_name AS nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        FROM (
            SELECT n_name, EXTRACT(year FROM o_orderdate) AS o_year,
                   CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))
                     - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))
                       * CAST(0.1 AS DECIMAL(8,2)) AS amount
            FROM part, supplier, lineitem, orders, nation
            WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
              AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
              AND p_name LIKE '%gear%'
        ) profit
        GROUP BY n_name, o_year
        ORDER BY nation, o_year
    """,
)
def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape with 10% of retailprice standing in for ps_supplycost
    (no partsupp in this schema). Part and supplier⨝nation broadcast;
    one orderkey shuffle feeds the (nation, year) aggregate."""
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    amount = (
        _money("l_extendedprice") * _one_minus("l_discount")
        - _money("p_retailprice") * F.col("l_quantity").cast("decimal(12,2)")
          * F.lit(0.1).cast("decimal(8,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("n_name").alias("nation"),
                F.year("o_orderdate").alias("o_year"), amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


# --- Q12-adapted: late shipping by order priority -------------------------
@register(
    "q12_late_shipping",
    oracle="""
        SELECT o_orderpriority,
               COUNT(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                          THEN 1 END) AS late_count,
               COUNT(*) AS total_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def q12_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape on the available columns: shipmode → orderpriority,
    commit/receipt lag → shipped >90 days after order date."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1
    ).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum(late).alias("late_count"), F.count(F.lit(1)).alias("total_count"))
        .orderBy("o_orderpriority")
    )


# --- Q13: customer order-count distribution (left outer + re-agg) ---------
@register(
    "q13_order_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserved through two aggregation levels; the
    second agg's input is one row per customer — tiny shuffle."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- Q14: promo revenue share ---------------------------------------------
@register(
    "q14_promo_effect",
    oracle=f"""
        SELECT CAST(100 AS DOUBLE)
                 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                 ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE)
                 / CAST(SUM({_REV}) AS DOUBLE) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    rev = _money("l_extendedprice") * _one_minus("l_discount")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(22,4)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100).cast("double") * F.sum(promo).cast("double")
             / F.sum(rev).cast("double")).alias("promo_revenue")
        )
    )


# --- Q15: top supplier(s) by quarterly revenue ----------------------------
@register(
    "q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no, CAST(SUM({_REV}) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery MAX over a derived view. Spark: compute the
    per-supplier revenue once, take its max via a 1-row broadcast
    cross join — the revenue view is evaluated a single time."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
             .cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- Q17: small-quantity revenue vs per-part average ----------------------
@register(
    "q17_small_qty_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
              SELECT 0.5 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                         / COUNT(*)
              FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated per-part average decorrelated into a grouped
    aggregate broadcast back onto the fact scan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.lit(0.5) * F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
         / F.count(F.lit(1))).alias("half_avg")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.sum(_money("l_extendedprice")).cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- Q18: large-volume customers (HAVING over grouped subquery) -----------
@register(
    "q18_large_volume",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (
              SELECT l_orderkey FROM lineitem
              GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HAVING subquery is a semi-join against an aggregate of the
    same fact — Spark computes it once and semi-joins on orderkey."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("q"))
        .filter(F.col("q") > F.lit(180).cast("decimal(12,2)"))
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"), li.l_orderkey == F.col("bk"), "inner")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# --- Q19-adapted: disjunctive predicates over a broadcast join ------------
@register(
    "q19_disjunctive_revenue",
    oracle=f"""
        SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity >= 10 AND l_quantity <= 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
               AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")

    def arm(brand: str, size_hi: int, qlo: int, qhi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & (F.col("l_quantity") >= qlo)
            & (F.col("l_quantity") <= qhi)
        )

    cond = arm("Brand#12", 15, 1, 11) | arm("Brand#23", 25, 10, 20) | arm("Brand#34", 35, 20, 30)
    rev = _money("l_extendedprice") * _one_minus("l_discount")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


# --- Q22-adapted: well-funded customers with no orders --------------------
@register(
    "q22_idle_rich_customers",
    oracle="""
        SELECT c_nationkey, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                                    / COUNT(*)
                           FROM customer c2 WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar-subquery threshold (global avg of positive
    balances, broadcast 1-row cross join) + anti-join on orders.
    "Idle" = no orders since 2000 (the testdata has no multi-year
    order gap, so a plain no-orders-ever anti-join matches nothing —
    Q22's own spirit is customers inactive for years)."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
              / F.count(F.lit(1))).alias("avg_bal"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.sum(_money("c_acctbal")).cast("double").alias("totacctbal"))
        .orderBy("c_nationkey")
    )


# --- CUBE over returnflag × linestatus ------------------------------------
@register(
    "cube_flag_status",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE = 4 grouping sets evaluated in one Expand+agg pass (no
    re-scan per set)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- GROUPING SETS: mixed granularities in one pass -----------------------
@register(
    "grouping_sets_revenue",
    oracle="""
        SELECT o_orderpriority, o_orderstatus,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                                (o_orderpriority, o_orderstatus))
        ORDER BY o_orderpriority, o_orderstatus
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("gs_orders")
    return orders.sparkSession.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                                (o_orderpriority, o_orderstatus))
        ORDER BY o_orderpriority, o_orderstatus
        """
    )


# --- Q4-adapted: priority counts for orders with a late lineitem ----------
@register(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4's decorrelated-EXISTS shape (commitdate/receiptdate absent:
    'late' = shipped >60 days after order date). The correlated EXISTS
    becomes a LEFT SEMI join on orderkey with the lateness predicate in
    the join condition — one shuffle, no duplicate-orders blowup the
    inner-join form would need a distinct to repair."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q11-adapted: part types holding an outsized share of stock value -----
@register(
    "q11_important_stock",
    oracle="""
        WITH typed AS (
            SELECT p_type,
                   SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS type_value
            FROM part GROUP BY p_type
        )
        SELECT p_type, CAST(type_value AS DOUBLE) AS value
        FROM typed
        WHERE CAST(type_value AS DOUBLE) >
              (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
               FROM part) * 0.15
        ORDER BY value DESC, p_type
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11's HAVING-against-scalar-subquery shape without partsupp:
    per-type value filtered by a fraction of the global total. The
    scalar total is a 1-row aggregate cross-joined (broadcast) into the
    grouped result — both aggregates come from ONE scan via Spark's
    reused exchange."""
    part = load_table(spark, sf_dir, "part")
    typed = part.groupBy("p_type").agg(
        F.sum(_money("p_retailprice")).alias("type_value")
    )
    total = part.agg(
        F.sum(_money("p_retailprice")).cast("double").alias("total_value")
    )
    return (
        typed.join(F.broadcast(total))
        .filter(F.col("type_value").cast("double") > F.col("total_value") * 0.15)
        .select("p_type", F.col("type_value").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "p_type")
    )


# --- Q16-adapted: supplier breadth per part type with exclusion -----------
@register(
    "q16_supplier_breadth",
    oracle="""
        SELECT p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_type <> 'PROMO'
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < -900.0)
        GROUP BY p.p_type
        ORDER BY supplier_cnt DESC, p.p_type
    """,
)
def q16_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16's shape from lineitem instead of partsupp: distinct-supplier
    counts per part type, excluding a (broadcast anti-joined) supplier
    blacklist. COUNT(DISTINCT) forces the classic two-phase expand —
    the partial distinct runs map-side before the type shuffle."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") != "PROMO"
    ).select("p_partkey", "p_type")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < -900.0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad, "l_suppkey", "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_type")
    )


# --- Q20-adapted: promotable suppliers (nested IN-subquery chain) ---------
@register(
    "q20_promotable_suppliers",
    oracle="""
        SELECT s_name, s_acctbal FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE '%gear%')
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey
            HAVING SUM(l_quantity) > 50.0
        )
        ORDER BY s_name
    """,
)
def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's shape without partsupp (reference has no joins at all —
    this is driver-contract relational coverage): suppliers who moved
    more than a threshold quantity of '%gear%' parts in 1996. The
    nested INs decorrelate to two LEFT SEMI joins; the part list
    broadcasts into the lineitem scan, the qualifying-supplier set
    (tiny after HAVING) broadcasts into the supplier scan."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    qualified = (
        li.join(F.broadcast(part), "l_partkey", "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50.0)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(qualified), "s_suppkey", "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --- Q21-adapted: sole late supplier on multi-supplier orders -------------
@register(
    "q21_waiting_suppliers",
    oracle="""
        WITH late AS (
            SELECT l_orderkey, l_suppkey,
                   (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS is_late
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier JOIN late l1 ON s_suppkey = l1.l_suppkey
        WHERE l1.is_late
          AND EXISTS (SELECT 1 FROM late l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.is_late)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's EXISTS / NOT-EXISTS correlation with `shipped >90 days
    after order date` standing in for the missing commit/receipt dates
    (same stand-in as q12): late lineitems on multi-supplier orders
    where NO other supplier on the order was late. The correlated
    subqueries decorrelate to a LEFT SEMI and a LEFT ANTI join on
    (orderkey, supplier-differs) — both shuffle on orderkey, the same
    key the late table is already keyed by."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey", "l_suppkey",
            (F.col("l_shipdate")
             > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("is_late"),
        )
    )
    l1 = late.filter("is_late").select(
        F.col("l_orderkey").alias("o1"), F.col("l_suppkey").alias("s1")
    )
    l2 = late.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = late.filter("is_late").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sole_late = (
        l1.join(l2, (F.col("o1") == F.col("o2")) & (F.col("s1") != F.col("s2")),
                "left_semi")
        .join(l3, (F.col("o1") == F.col("o3")) & (F.col("s1") != F.col("s3")),
              "left_anti")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(supp), F.col("s1") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
