"""Central query registry: named DataFrame programs + DuckDB oracle SQL.

Every operator the engine claims (SURVEY.md §2) registers here as
  * a callable ``(spark, sf_dir) -> DataFrame`` — the Spark-first
    implementation, and
  * (when SQL-expressible) an equivalent ANSI-SQL string the DuckDB
    oracle can run over the same parquet tables.

``__spark_entry__.queries()/oracle_sql()`` are thin views over this.

Determinism rules (so order-insensitive value-hash comparison holds):
  * money arithmetic goes through exact DECIMAL casts and only the
    final aggregate is cast to DOUBLE — both engines produce the
    identical f64, independent of partial-aggregation order;
  * averages are written ``CAST(SUM(decimal) AS DOUBLE)/COUNT(*)`` in
    both engines (DuckDB's AVG over decimal returns a double computed
    differently from Spark's decimal AVG);
  * floating outputs that cannot be exact (vector math) are rounded to
    6 decimals in both engines, with ordering done on the unrounded
    value plus an id tie-break;
  * every LIMIT/OFFSET query sorts with a unique tie-break column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}
# Queries whose oracle is a VALUES pin of a deterministic-but-not-
# SQL-derivable output (zlib ratios, seeded index stats, greedy
# reranks). The pin is computed at ONE scale factor — the driver's
# sf0.01 — so the local parity suite must skip the value compare at
# other SFs (tests/test_oracle_parity.py). Maps name -> sf tag.
ORACLE_SF: dict[str, str] = {}


def register(name: str, oracle: str | None = None,
             oracle_sf: str | None = None):
    """Register a query under ``name`` with an optional DuckDB oracle.
    ``oracle_sf`` declares the oracle valid only at that scale factor
    (a pinned-VALUES oracle; see ORACLE_SF)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        if oracle_sf is not None:
            if oracle is None:
                raise ValueError(f"{name!r}: oracle_sf without an oracle")
            ORACLE_SF[name] = oracle_sf
        return fn

    return deco


def load_all() -> None:
    """Import every query module so their @register calls run."""
    from crawler_spark.plans import (  # noqa: F401
        queries_curation,
        queries_dedup,
        queries_events,
        queries_graph,
        queries_mlprep,
        queries_pipeline,
        queries_ragprep,
        queries_reference,
        queries_scale,
        queries_search,
        queries_sources,
        queries_spandedup,
        queries_temporal,
        queries_text,
        queries_tpch,
        queries_tpch2,
        queries_vector,
    )
