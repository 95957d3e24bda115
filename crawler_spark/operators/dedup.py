"""Near-duplicate detection at scale (SURVEY.md §7 M5 / the
training-data-pipeline extensions): MinHash+LSH, SimHash, and
LSH-bucketed embedding near-dup.

Design for 100 TB: every method here avoids the O(n²) pair space by
construction —
  * MinHash LSH: per-doc signatures (one groupBy over exploded
    shingles), banded so only docs sharing a band bucket are paired;
    the band join shuffles on (band_id, band_hash) — high cardinality,
    uniform, no skew.
  * SimHash: 64-bit signature per doc (one vectorized pass), candidate
    pairs from 16-bit band buckets (pigeonhole: hamming ≤ 3 ⇒ at least
    one of 4 bands equal), verified with bit_count(xor).
  * Embedding LSH: random-hyperplane sign bits bucket the vectors;
    exact cosine re-rank only within buckets.

Exact baselines these approximate: dedup_ngram_jaccard and
simsearch_cosine_pairs (oracle-checked in plans/) — tests compare
recall against them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions import text as X


# ---------------------------------------------------------------- MinHash
def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, signature array<long>) — minimum of xxhash64 over the doc's
    distinct k-word shingles under ``num_hashes`` salted hash functions.
    One explode + one groupBy with num_hashes min-aggregates: map-side
    combine keeps the shuffle at one row per (doc, shingle-free) —
    no signature matrix materialized."""
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(X.word_shingles(text_col, shingle_k))).alias("g"),
    )
    aggs = [
        F.min(F.xxhash64(F.concat(F.lit(f"mh{i}|"), F.col("g")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = grams.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    est_threshold: float = 0.5,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH, scored by
    estimated Jaccard (fraction of agreeing signature components).

    rows-per-band = num_hashes/bands; a pair becomes a candidate iff
    some band's slice of the signature matches exactly. With 32 hashes
    in 8 bands of 4, P(candidate) ≈ 1-(1-j⁴)⁸ — steep around j≈0.5.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_k).cache()

    banded = sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", *[
                            F.element_at("signature", b * rows_per_band + r + 1).cast("string")
                            for r in range(rows_per_band)
                        ])
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")

    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    sa = sig.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b"))
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda eq: eq)).cast("double") / num_hashes
    )
    return (
        candidates.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= est_threshold)
    )


# ---------------------------------------------------------------- SimHash
def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash long): 64-bit bit-majority over xxhash64 of the
    doc's tokens — pure expressions, one pass, no UDF. For each bit i,
    the signature bit is 1 iff more tokens have bit i set than not."""
    toks = X.tokenize(text_col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(hashes)

    def bit_mask(i: int) -> int:
        # bit 63 is the sign bit of a signed long
        return (1 << i) if i < 63 else -(1 << 63)

    # per bit: count of hashes with bit set, folded into the signature
    # (factory closure — a 2-arg lambda would be read by F.filter as
    # (element, index))
    def bit_term(i: int) -> F.Column:
        mask = bit_mask(i)
        set_count = F.size(
            F.filter(hashes, lambda h: h.bitwiseAND(F.lit(mask)) != 0)
        )
        return F.when(set_count * 2 > n, F.lit(mask)).otherwise(F.lit(0).cast("long"))

    bit_terms = [bit_term(i) for i in range(64)]
    sig = bit_terms[0]
    for t in bit_terms[1:]:
        sig = sig.bitwiseOR(t)
    return docs.select(F.col(id_col).alias("id"), sig.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Candidates from 4×16-bit band buckets (pigeonhole: ≤3 differing
    bits can't touch all 4 bands), verified by bit_count(a xor b)."""
    sig = simhash(docs, text_col, id_col).cache()
    banded = sig.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
            )
            for b in range(4)
        ])).alias("bb"),
    ).select("id", "simhash", "bb.band", "bb.bucket")

    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------- Embedding LSH (ANN path)
def embedding_lsh_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine near-dup pairs: random-hyperplane sign bits →
    band buckets → exact cosine re-rank inside buckets only.

    The scale path for simsearch_cosine_pairs: the full pair space is
    never touched; shuffle is keyed by (band, bucket). Recall depends on
    threshold vs num_planes/bands (sign-bit agreement prob = 1-θ/π)."""
    import numpy as np

    from crawler_spark.functions import vector as V

    rng = np.random.default_rng(seed)
    dims = len(df.select(vec_col).first()[0])
    planes = rng.standard_normal((num_planes, dims))
    rows_per_band = num_planes // bands

    norm = df.select(F.col(id_col).alias("id"), V.l2_normalize(vec_col).alias("v"))
    # sign bit per plane as an expression over the plane literal
    bits = [
        (V.dot("v", V.vector_lit(planes[i].tolist())) >= 0).cast("int").alias(f"b{i}")
        for i in range(num_planes)
    ]
    sig = norm.select("id", "v", *bits)
    banded = sig.select(
        "id", "v",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("", *[F.col(f"b{b * rows_per_band + r}")
                                  for r in range(rows_per_band)]).alias("bucket"),
            )
            for b in range(bands)
        ])).alias("bb"),
    ).select("id", "v", "bb.band", "bb.bucket")

    a, b = banded.alias("a"), banded.alias("b")
    cos = V.dot(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                cos.alias("cosine"))
        .distinct()
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )


def canonical_assignment(pairs: DataFrame, all_ids: DataFrame, id_col: str) -> DataFrame:
    """Map every id to a canonical representative: min id among its
    near-dup neighbors (single-hop union-find approximation — adequate
    when duplicate clusters are small; iterate to convergence for full
    transitive closure)."""
    neighbors = pairs.select(F.col("id_a").alias("id"), F.col("id_b").alias("nb")).unionByName(
        pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("nb"))
    )
    best = neighbors.groupBy("id").agg(F.min("nb").alias("min_nb"))
    return (
        all_ids.select(F.col(id_col).alias("id"))
        .join(best, "id", "left")
        .select("id", F.least(F.col("id"), F.coalesce("min_nb", "id")).alias("canonical_id"))
    )
