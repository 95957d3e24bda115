"""Similarity search operators: exact k-NN and scale-path variants.

Exact top-k is a single Catalyst ``TakeOrderedAndProject`` over a
distance expression — no shuffle of the full table, each partition
keeps its local top-k and only k rows per partition reach the driver.
That is the right physical plan up to billions of rows; past that, the
LSH-bucketed variant (operators/ann.py) prunes candidates first.

Reference semantics: ``POST /search`` — distance = -(e . q) (pgvector
``<#>``), filter distance <= 1 - similarity_threshold, ORDER BY
distance LIMIT k (reference backend/src/db.py:78-87, search.py:77-99).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions import vector as V


def knn_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 5,
    vec_col: str = "embedding",
    id_cols: Sequence[str] = ("vec_id",),
    max_distance: float | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Exact top-k by negative-inner-product distance.

    ``normalize=True`` applies the ingest invariant (stored vectors are
    L2-normalized — reference tasks.py:87-88) at query time, which the
    raw testdata requires. Ties broken by the first id column so the
    result set is deterministic.
    """
    q = V.vector_lit(query_vec)
    emb = V.l2_normalize(vec_col) if normalize else V.to_double_array(vec_col)
    out = df.select(*id_cols, V.neg_dot(emb, q).alias("distance"))
    if max_distance is not None:
        out = out.filter(F.col("distance") <= F.lit(float(max_distance)))
    order = [F.col("distance").asc()] + [F.col(c).asc() for c in id_cols]
    return out.orderBy(*order).limit(k)


def cosine_pairs_exact(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs (a < b) with cosine similarity >= threshold.

    Exact O(n²) self-join — the correctness baseline. At 100 TB use
    ``operators.dedup.embedding_near_dup_lsh`` (bucketed candidates)
    instead; this form exists for oracle parity and small dims/tables.
    The join condition ``a.id < b.id`` halves the pair space before the
    distance computation runs.
    """
    a = df.select(F.col(id_col).alias("id_a"),
                  V.l2_normalize(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"),
                  V.l2_normalize(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = V.dot("va", F.col("vb"))
    return (
        pairs.select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )
