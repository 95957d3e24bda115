"""Bloom-filter join pruning: kill non-matching fact rows MAP-SIDE,
before they pay the shuffle, when the build side is too large to
broadcast as a hash table but its Bloom bits are not.

The niche between `F.broadcast` and a plain shuffle join at 100 TB:
a 100M-key build side is tens of GB as a broadcast hash table (dead on
arrival) but ~180 MB as Bloom bits at 1% fpp — and a 1%-fpp prefilter
on a 1%-selective semi-join cuts the fact shuffle ~50×. Spark's own
runtime row-level filtering (`spark.sql.optimizer.runtime.bloomFilter
.enabled`, SPARK-32268) does this opportunistically inside ONE join;
this explicit operator makes the filter a value you control — build it
once, apply it to several scans, ship it across jobs, or push it into
a stage the optimizer can't see through (e.g. ahead of an aggregation
that feeds the join).

Correctness: Bloom membership never false-negatives, so prefilter +
the real join is EXACTLY the plain join — false positives are dropped
by the join itself. The registered query's oracle is the plain-join
SQL for that reason.

The bitset build is distributed (explode key→k positions, groupBy word
index, bit_or); only the finished words come to the driver — bounded
by the CONFIGURED filter size (num_bits/64 longs), never by the data.
Membership testing is a pure Catalyst expression (xxhash64 + shifts on
a constant-folded literal array): codegen-friendly, no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_bloom_bits(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> list[int]:
    """Build the Bloom bitset for ``df[key_col]`` as ``num_bits/64``
    longs. Size it as m ≈ -n·ln(fpp)/ln(2)² bits for n expected keys
    (m = 10n bits ⇒ fpp ≈ 1%); k = num_hashes ≈ 0.7·m/n."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    # no .distinct(): bit_or is idempotent, so duplicate positions are
    # free, while a distinct would add a full extra shuffle of
    # n·num_hashes rows before the word aggregation's map-side combine
    positions = df.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(s)), F.lit(num_bits))
                    for s in range(num_hashes)
                ]
            )
        ).alias("p")
    )
    words = (
        positions.select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    arr = [0] * (num_bits // 64)
    for r in words:
        arr[r.w] = r.bits
    return arr


def bloom_might_contain(
    key: Column | str,
    bits: list[int],
    num_hashes: int = 5,
) -> Column:
    """Membership-test expression against a built bitset: true for
    every inserted key, true spuriously at ~fpp — never false for a
    member, so it is always safe as a join PREfilter."""
    key = F.col(key) if isinstance(key, str) else key
    num_bits = len(bits) * 64
    # ONE array literal, not an F.array of per-word F.lit columns: a
    # production-sized filter is millions of words, and a million-child
    # expression node blows up plan construction/serialization long
    # before execution
    lit_bits = F.lit([int(b) for b in bits]).cast("array<long>")
    cond = F.lit(True)
    for s in range(num_hashes):
        p = F.pmod(F.xxhash64(key, F.lit(s)), F.lit(num_bits))
        word = F.element_at(lit_bits, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, (p % 64).cast("int")
        ).bitwiseAND(F.lit(1))
        cond = cond & (bit == 1)
    return cond


def bloom_prefiltered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Exact ``fact ⋈ dim`` with the fact side Bloom-prefiltered on the
    join key before the shuffle. Same answer as the plain join; the
    shuffle carries only (matching + fpp·non-matching) fact rows.

    Only match-preserving join types are accepted: under outer/anti
    joins the prefilter would DELETE non-matching fact rows the join
    semantics require to survive (left rows with NULL dim columns,
    or the anti-join's entire output)."""
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(
            f"bloom prefilter is only answer-preserving for inner/semi "
            f"joins, got how={how!r}")
    bits = build_bloom_bits(dim, dim_key, num_bits=num_bits, num_hashes=num_hashes)
    pruned = fact.filter(
        bloom_might_contain(fact_key, bits, num_hashes=num_hashes)
    )
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
