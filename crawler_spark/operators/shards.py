"""Deterministic shuffle-shard export: the last step of a training-data
pipeline, turning a cleaned corpus into N pseudo-randomly permuted,
roughly equal shards that data loaders stream sequentially.

Training wants documents in a fixed random-looking order (so batches
decorrelate) that is REPRODUCIBLE — rebuild the corpus on a different
cluster size and byte-identical shards must come out, or training runs
aren't comparable. RNG-based shuffles can't give that; hash-based
ordering can (the same argument queries_mlprep.py makes for hash
sampling). No reference-repo analogue — the reference serves search
results, it never exports corpora; this is part of the brief's
training-pipeline surface.

Scale shape: shard assignment and the within-shard order are pure
per-row projections of a seeded hash — no global sort, no driver
state. The only movement is one repartition on shard_id (each shard's
rows converge on one task) followed by a within-partition sort; both
are exactly what ``write.partitionBy`` needs anyway. At 100 TB, pick
num_shards so a shard is a few GB (tens of thousands of shards): the
repartition is a uniform hash shuffle and every task sorts only its
own shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    num_shards: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Add (shard_id, sort_key) columns: a seeded xxhash64 pmod for the
    shard and an independent (seed+1) hash for the within-shard order.
    Deterministic in the row's id alone — stable across engines runs,
    partitionings, and cluster sizes; changing ``seed`` produces an
    unrelated permutation."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    return df.withColumn(
        "shard_id", F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(num_shards))
    ).withColumn("sort_key", F.xxhash64(F.lit(seed + 1), F.col(id_col)))


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    num_shards: int = 16,
    seed: int = 42,
) -> None:
    """Materialize ``df`` as ``num_shards`` parquet shard directories
    (``shard_id=K/``), each internally ordered by the seeded hash.
    ``repartition(num_shards, shard_id)`` lands every shard on exactly
    one task, so each shard directory holds ONE file — the shape data
    loaders want — and ``sortWithinPartitions`` is a local sort, never
    a global one."""
    out = assign_shards(df, id_col, num_shards, seed)
    (
        out.repartition(num_shards, "shard_id")
        # shard_id leads the sort: the dynamic-partition writer requires
        # task rows ordered by partition column and would inject its own
        # (order-destroying) sort if they weren't already
        .sortWithinPartitions("shard_id", "sort_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
