"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json). Fill these in
as you implement operators from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Semantic top-k search (the reference's ``POST /search``): stub-embed
    a query, L2-normalize+pad, negative-inner-product distance over the
    embeddings table, exact top-k, broadcast-join document text, snippet
    per hit.
    """
    from crawler_spark.plans.search_api import semantic_search

    return semantic_search(
        spark, "/root/testdata/sf0.001", "fast hash join merge", k=5,
        similarity_threshold=0.0,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Backed by the central registry (crawler_spark/plans/registry.py).
    """
    from crawler_spark.plans import registry

    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (same parquet tables,
    pre-registered views). Queries absent here are rows-only checks
    (non-SQL-expressible ops)."""
    from crawler_spark.plans import registry

    registry.load_all()
    return dict(registry.ORACLE)
