"""Link-graph operators: PageRank over a (src, dst) edge DataFrame —
the crawl-prioritization signal (which frontier URLs are worth
fetching first) and a generic iterative-computation template beside
the canonical-closure family (operators/dedup.py).

Shape at scale: ranks and out-degrees are node-cardinality DataFrames;
every iteration is one equi-join of edges⨝ranks on src (shuffle keyed
on node id) plus one groupBy(dst) — the textbook distributed power
iteration, no driver-side graph state. A hub page with millions of
in-links is one hot groupBy key; AQE skew splitting handles it the
same way it does a hot join key. ``localCheckpoint`` per iteration
truncates the lineage exactly as the closure operators do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    tol: float = 1e-7,
    stats: dict | None = None,
) -> DataFrame:
    """Power-iteration PageRank. ``edges`` rows are directed links;
    duplicate edges are collapsed (a page linking twice votes once,
    matching link-extractor dedup). Dangling nodes (no out-links)
    redistribute their mass uniformly each round — one scalar
    aggregate per iteration — so total rank stays 1 and the result
    matches the standard formulation. Returns (id, rank), ranks
    rounded to 6 decimals (float partial-sum order is partitioning-
    dependent below that).

    ``iterations`` is a CEILING, not a schedule: iteration stops early
    once the L1 delta between consecutive rank vectors drops below
    ``tol`` (set ``tol=0`` to force the fixed count). The delta is one
    node-cardinality join per round — same cost class as the iteration
    itself — and each round already synchronizes on the eager
    localCheckpoint, so the early exit costs one scalar collect and
    saves whole iterations once the walk has mixed. ``tol=1e-7`` is an
    order below the 6-decimal output rounding, so converged-early and
    fixed-count results are identical after rounding. Pass a dict as
    ``stats`` to receive ``{"iterations_run": k}`` back (observability
    for the early exit; the DataFrame itself can't carry it).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("rank"))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = (1.0 - damping) / n

    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    iters_run = 0
    for _ in range(iterations):
        prev = ranks
        iters_run += 1
        # dangling mass (nodes with no out-links) stays IN the plan as a
        # broadcast 1-row frame — a driver-side .first() here would add
        # a synchronizing job per iteration
        dang = (
            ranks.join(out_deg, ranks.id == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
        )
        contribs = (
            e.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(out_deg, "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, nodes.id == contribs.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_mass"), F.lit(0.0))
                       + F.col("dmass") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if tol > 0:
            delta = (
                ranks.join(
                    prev.withColumnRenamed("rank", "prev_rank"), "id")
                .agg(F.sum(F.abs(F.col("rank") - F.col("prev_rank")))
                     .alias("d"))
                .first()["d"]
            )
            if delta is not None and delta < tol:
                break
    if stats is not None:
        stats["iterations_run"] = iters_run
    return ranks.select("id", F.round("rank", 6).alias("rank"))


def hits(
    edges: DataFrame,
    iterations: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    tol: float = 1e-7,
    stats: dict | None = None,
) -> DataFrame:
    """HITS hubs/authorities (Kleinberg, JACM 1999) — the second
    classic link-analysis signal beside ``pagerank``: an AUTHORITY is
    pointed at by good hubs, a HUB points at good authorities. For
    crawl prioritization the two disagree usefully: PageRank surfaces
    pages the random surfer lands on, authority scores surface pages
    link-curators vouch for, and hub scores find the index/directory
    pages whose outlinks are worth expanding first.

    Same distributed template as ``pagerank``: per half-iteration one
    equi-join of edges⨝scores plus one groupBy on the other endpoint —
    all shuffles keyed on node id, no driver-side graph state. The L2
    normalization scalar stays IN the plan as a broadcast 1-row frame
    (a ``.first()`` would add a synchronizing job per round); the only
    per-round driver sync is the early-exit delta, same contract as
    ``pagerank`` (``iterations`` is a ceiling, ``tol=0`` forces the
    fixed count, ``stats`` receives ``iterations_run``).

    Returns (id, hub, authority) rounded to 6 decimals; nodes with no
    out-links have hub 0, no in-links authority 0.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if nodes.count() == 0:
        return nodes.select(
            "id", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        )

    def _normalize(df: DataFrame, col: str) -> DataFrame:
        norm = df.agg(
            F.sqrt(F.coalesce(F.sum(F.col(col) * F.col(col)), F.lit(0.0)))
            .alias("nrm")
        )
        return (
            df.crossJoin(F.broadcast(norm))
            .select(
                "id",
                F.when(F.col("nrm") > 0, F.col(col) / F.col("nrm"))
                .otherwise(F.lit(0.0))
                .alias(col),
            )
        )

    hubs = nodes.select("id", F.lit(1.0).alias("hub"))
    auth = nodes.select("id", F.lit(1.0).alias("authority"))
    iters_run = 0
    for _ in range(iterations):
        prev_auth = auth
        iters_run += 1
        auth = _normalize(
            nodes.join(
                e.join(hubs.withColumnRenamed("id", "src"), "src")
                .groupBy("dst")
                .agg(F.sum("hub").alias("authority")),
                nodes.id == F.col("dst"),
                "left",
            ).select(
                "id", F.coalesce("authority", F.lit(0.0)).alias("authority")
            ),
            "authority",
        ).localCheckpoint(eager=True)
        hubs = _normalize(
            nodes.join(
                e.join(auth.withColumnRenamed("id", "dst"), "dst")
                .groupBy("src")
                .agg(F.sum("authority").alias("hub")),
                nodes.id == F.col("src"),
                "left",
            ).select("id", F.coalesce("hub", F.lit(0.0)).alias("hub")),
            "hub",
        ).localCheckpoint(eager=True)
        if tol > 0:
            delta = (
                auth.join(
                    prev_auth.withColumnRenamed("authority", "pa"), "id")
                .agg(F.sum(F.abs(F.col("authority") - F.col("pa"))).alias("d"))
                .first()["d"]
            )
            if delta is not None and delta < tol:
                break
    if stats is not None:
        stats["iterations_run"] = iters_run
    return (
        hubs.join(auth, "id")
        .select(
            "id",
            F.round("hub", 6).alias("hub"),
            F.round("authority", 6).alias("authority"),
        )
    )
