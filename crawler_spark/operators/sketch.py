"""Mergeable quantile sketch: coordinated bottom-k-by-hash sampling.

The rollup pattern HLL gives distinct counts (`ev_hll_distinct_rollup`)
and KMV gives set intersections (`ev_kmv_distinct_intersect`), applied
to QUANTILES: keep, per partition-unit (a day, a shard), the k rows
whose deterministic 60-bit md5 hash is smallest, carrying the metric
value alongside the hash. Because "bottom-k of a union == bottom-k of
the concatenated bottom-ks", day sketches MERGE losslessly into
any-range sketches — a quarter's p99 comes from merging ~90 tiny
day states instead of rescanning the raw events. The surviving k
values are a uniform random sample of the range (the hash is uniform
and coordinated across days), so selection quantiles over them
estimate range quantiles with standard sampling error ~1/√k.

Everything is deterministic and engine-portable: the hash is the
md5-prefix convention the KMV/CMS sketches already use (both Spark and
DuckDB compute it bit-identically), sketches are sorted struct arrays,
and quantile extraction is SELECTION (nearest-rank on the sorted
sample) rather than interpolation, so the reported quantile is an
exact stored double — no float arithmetic that could split engines.

Scale shape: BUILD sketches from raw events with ``bottomk_sketches``
(window rank ≤ k: one shuffle on the unit key, a spillable per-unit
sort, k rows retained — per-task memory never holds a unit's full row
list). MERGE with the ``merge_sketches`` aggregate expression — its
input is units×k structs, bounded by construction. The
``bottomk_sketch_agg`` expression form buffers the whole group in its
collect_list before truncating, so it is only safe where the group is
already sketch-sized — building from raw events with it would hold a
billion-event day in one aggregation buffer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 256

# 60-bit uniform hash both engines compute identically (15 md5 hex
# chars) — the repo-wide sketch-hash convention (see queries_events.py
# KMV).  SQL twin: ('0x' || substr(md5(CAST(<id> AS VARCHAR)), 1, 15))::BIGINT
def sketch_hash(id_col: Column | str) -> Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, 15), 16, 10
    ).cast("long")


def bottomk_sketch_agg(
    hash_col: Column | str, value_col: Column | str, k: int = DEFAULT_K
) -> Column:
    """Aggregate expression building one bottom-k (hash, value) sketch
    per group: sorted struct array, hash leading so array_sort's
    lexicographic struct order IS the bottom-k-by-hash order.

    State warning: collect_list buffers EVERY row of the group before
    the slice truncates — use this form only where groups are already
    small (unit tests, re-sketching sketch-sized data). Building from
    raw events belongs to ``bottomk_sketches``, whose per-task state
    is bounded."""
    h = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.slice(
        F.array_sort(F.collect_list(F.struct(h.alias("h"), v.alias("v")))),
        1, k,
    )


def bottomk_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    hash_col: Column | str,
    value_col: Column | str,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Bounded per-group sketch BUILDER for raw-event scale: window
    rank ≤ k over (hash, value) within each group, then a collect_list
    over exactly the k survivors. Same answer as ``bottomk_sketch_agg``
    (rank ties are full-struct ties, so any pick yields the identical
    sorted array) but the heavy stage is a SPILLABLE per-group sort
    retaining k rows — never an aggregation buffer holding the group's
    entire row list. The rank filter and the final groupBy hash-
    partition on the same key, so the planner reuses one exchange."""
    from pyspark.sql import Window

    h = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("h").asc(), F.col("v").asc())
    kept = (
        df.select(*group_cols, h.alias("h"), v.alias("v"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
    return kept.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.struct("h", "v"))).alias("sk"))


def merge_sketches(sketch_col: Column | str, k: int = DEFAULT_K) -> Column:
    """Aggregate expression merging many bottom-k sketches into one:
    bottom-k of the concatenation. Lossless for the bottom-k state
    (the defining mergeability property, oracle-proven by
    `ev_quantile_merge_rollup`: maintain-and-merge hash-equals a
    from-scratch recompute)."""
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    return F.slice(F.array_sort(F.flatten(F.collect_list(c))), 1, k)


def sketch_quantiles(
    df: DataFrame, sketch_col: str, quantiles: Sequence[float],
    names: Sequence[str] | None = None,
) -> DataFrame:
    """Selection (nearest-rank) quantiles over a sketch column's
    sampled values: sort the k values, pick index
    round(q·(n-1)) — the result is one of the stored doubles, never an
    interpolation, so two engines agree exactly. Keeps all other
    columns; adds `n_sampled` and one column per quantile."""
    names = names or [f"p{int(q * 100)}" for q in quantiles]
    vals = F.array_sort(
        F.transform(F.col(sketch_col), lambda s: s["v"]))
    n = F.size(F.col(sketch_col))
    out_cols = [c for c in df.columns if c != sketch_col]
    picks = []
    for q, nm in zip(quantiles, names):
        idx0 = F.floor(F.lit(float(q)) * (n - 1) + F.lit(0.5)).cast("int")
        picks.append(F.get(vals, idx0).alias(nm))
    return df.select(*out_cols, n.alias("n_sampled"), *picks)
