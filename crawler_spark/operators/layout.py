"""Data-layout operators: Z-order (Morton) clustering, the multi-
dimensional cousin of sorting for min/max pruning.

A table sorted on one column prunes scans on that column only; row
groups laid out along a Z-order curve of TWO columns keep both
columns' min/max ranges tight in every file, so a 2-dimensional box
predicate skips most files (the layout trick behind Delta/Iceberg
OPTIMIZE ZORDER, rebuilt here from the public definition of the
curve). Everything is pure expressions: per-column min/max scalars
broadcast in, values scale to 16-bit ranks, and the Morton key is a
32-term bit-interleave that whole-stage codegen folds into one long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BITS = 16


def _scaled(col: str, lo: str, hi: str) -> F.Column:
    """Value → 0..2^BITS-1 rank within [lo, hi] (degenerate range → 0)."""
    span = F.col(hi) - F.col(lo)
    frac = F.when(span > 0, (F.col(col) - F.col(lo)).cast("double") / span) \
        .otherwise(F.lit(0.0))
    return F.least(
        F.floor(frac * (1 << _BITS)).cast("long"), F.lit((1 << _BITS) - 1))


def zorder_key(a: F.Column, b: F.Column) -> F.Column:
    """Morton interleave of two 16-bit values into one long: bit i of
    ``a`` lands at position 2i, bit i of ``b`` at 2i+1."""
    parts = []
    for i in range(_BITS):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    key = parts[0]
    for p in parts[1:]:
        key = key.bitwiseOR(p)
    return key


_HIST_BITS = 12  # equal-frequency cut resolution: 4096 histogram cells


def _partition_remap(spark, n: int) -> list[int]:
    """For each bucket j in 0..n-1, an int v with
    ``pmod(murmur3(v), n) == j`` — found by probing Spark's own hash
    function (fixed-seed murmur3, so the probe is deterministic across
    runs and sessions). Repartitioning on the remapped value places
    each bucket ALONE in its own shuffle partition, i.e. one output
    file per bucket, where hashing the raw bucket id would collide
    some buckets into shared files and leave others empty."""
    probe = spark.range(0, 64 * n).select(
        F.col("id").cast("int").alias("v"),
        F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("p"),
    ).collect()
    remap: dict[int, int] = {}
    for r in probe:
        remap.setdefault(r.p, r.v)
    if len(remap) != n:  # 64 probes per residue: vanishing, and loud
        raise RuntimeError(f"hash probe covered {len(remap)}/{n} buckets")
    return [remap[j] for j in range(n)]


def equal_frequency_cuts(
    hist: list[tuple[int, int]], n_buckets: int,
) -> list[int]:
    """Greedy equal-frequency bucket boundaries over a (cell, count)
    histogram: ``cuts[j]`` is the LAST cell of bucket j, chosen so the
    running mass first reaches (j+1)/n_buckets of the total at that
    cell. Pure driver-side arithmetic over the bounded histogram —
    deterministic by construction, which is the whole point (see
    write_zordered). Properties (hypothesis-pinned in
    tests/test_properties.py): at most n_buckets-1 cuts,
    non-decreasing, every cut is a histogram cell, and each bucket's
    mass overshoots the ideal total/n_buckets by at most its boundary
    cell's count (the granularity bound — a histogram cell is never
    split)."""
    total = sum(n for _, n in hist)
    cuts: list[int] = []
    acc, k = 0, 1
    for c, n in sorted(hist):
        acc += n
        while k < n_buckets and acc * n_buckets >= k * total:
            cuts.append(int(c))
            k += 1
    return cuts


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    (col_a, col_b) Z-curve, DETERMINISTICALLY: equal-frequency file
    cuts come from an exact bounded histogram of the Morton key's top
    ``_HIST_BITS`` bits (one map-side-combined groupBy into ≤4096 rows,
    cumulated on the driver), not from ``repartitionByRange``'s
    per-run-seeded reservoir sample — so the same input always yields
    byte-identical file membership, which is what makes the layout
    job's stats regression-pinnable and a production table rebuild
    reproducible. One corpus-scale shuffle (the final repartition);
    the histogram pass is a second scan but its output is bounded.
    Downstream scans prune files via parquet min/max stats on BOTH
    columns."""
    spark = df.sparkSession
    stats = df.agg(
        F.min(col_a).alias("__alo"), F.max(col_a).alias("__ahi"),
        F.min(col_b).alias("__blo"), F.max(col_b).alias("__bhi"),
    )
    keyed = (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__z", zorder_key(
            _scaled(col_a, "__alo", "__ahi"), _scaled(col_b, "__blo", "__bhi")))
        .drop("__alo", "__ahi", "__blo", "__bhi")
    )
    cell = F.shiftright(F.col("__z"), 2 * _BITS - _HIST_BITS)
    hist = [
        (r["__cell"], r["__n"])
        for r in keyed.groupBy(cell.alias("__cell"))
        .agg(F.count(F.lit(1)).alias("__n")).collect()
    ]
    cuts = equal_frequency_cuts(hist, n_files)
    if cuts:
        bucket = F.size(F.filter(
            F.lit(cuts).cast("array<long>"), lambda q: q < cell))
    else:  # n_files == 1 or empty input (a single-cell distribution
        # still yields n_files-1 duplicate cuts, not an empty list)
        bucket = F.lit(0)
    part = F.element_at(
        F.lit(_partition_remap(spark, n_files)), bucket + 1)
    (
        keyed.withColumn("__p", part)
        .repartition(n_files, "__p")
        .sortWithinPartitions("__z")
        .drop("__z", "__p")
        .write.mode("overwrite").parquet(path)
    )


def compact_files(
    spark,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 << 20,
) -> dict:
    """Small-file compaction (the OPTIMIZE/rewrite half of table
    maintenance): rewrite a fragmented parquet directory into
    ⌈total_bytes / target_bytes⌉ files of ~target size.

    Small files are the silent 100 TB killer on the WRITE side the way
    skew is on the shuffle side: a streaming/append pipeline (e.g.
    ``append_banded_index``, the streaming upsert) adds ≥1 file per
    batch per partition, and a 100k-file directory costs minutes of
    listing + task-per-file scheduling before a scan reads a byte.
    Compaction is an O(data) rewrite, so it runs periodically, not
    per-batch — Delta/Iceberg OPTIMIZE rebuilt from its public shape.

    Sizing uses the filesystem's own content summary (works on any
    Hadoop-supported FS), then ONE round-robin repartition — a full
    shuffle, the honest cost of re-coalescing; use coalesce() instead
    only when input files are already co-sized. Returns
    {files_before, files_after, total_bytes, rows}.
    """
    import math

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jpath.getFileSystem(hconf)
    summary = fs.getContentSummary(jpath)
    total = int(summary.getLength())

    df = spark.read.parquet(src_path)
    files_before = len(df.inputFiles())
    n_out = max(1, math.ceil(total / target_bytes))
    df.repartition(n_out).write.mode("overwrite").parquet(dst_path)
    out = spark.read.parquet(dst_path)
    return {
        "files_before": files_before,
        "files_after": len(out.inputFiles()),
        "total_bytes": total,
        "rows": out.count(),
    }
