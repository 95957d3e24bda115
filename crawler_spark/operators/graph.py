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
) -> DataFrame:
    """Power-iteration PageRank. ``edges`` rows are directed links;
    duplicate edges are collapsed (a page linking twice votes once,
    matching link-extractor dedup). Dangling nodes (no out-links)
    redistribute their mass uniformly each round — one scalar
    aggregate per iteration — so total rank stays 1 and the result
    matches the standard formulation. Returns (id, rank), ranks
    rounded to 6 decimals (float partial-sum order is partitioning-
    dependent below that).
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
    for _ in range(iterations):
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
    return ranks.select("id", F.round("rank", 6).alias("rank"))
