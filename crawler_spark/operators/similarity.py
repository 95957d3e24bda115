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
    """All pairs (a < b) with cosine similarity >= threshold — exact.

    Physical strategy: broadcast the normalized matrix (n×d float64) to
    every executor, then one vectorized ``mapInPandas`` pass computes
    each partition's block × full-matrix product with BLAS and emits
    only the above-threshold pairs. No O(n²)-row shuffle ever
    materializes — the quadratic work happens inside matmul, the output
    is only the surviving pairs.

    Scale ceiling is the broadcast (n×d×8 bytes): fine to ~10M×64 dims
    (~5 GB) per executor; past that use the LSH-bucketed variant
    (operators/dedup.py) which prunes candidate pairs first.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    norm = df.select(F.col(id_col).alias("id"), V.l2_normalize(vec_col).alias("v"))
    # one collect of the (already reduced) id+vector projection
    local = norm.collect()
    ids = np.array([r.id for r in local], dtype=np.int64)
    mat = np.array([r.v for r in local], dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    thr = float(threshold)

    def block_pairs(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        pos = {int(i): p for p, i in enumerate(all_ids)}
        for pdf in batches:
            rows = pdf["id"].to_numpy()
            block = np.array([pos[int(i)] for i in rows])
            sims = all_mat[block] @ all_mat.T  # (b, n) BLAS block product
            out_a, out_b, out_s = [], [], []
            for bi, p in enumerate(block):
                js = np.nonzero(sims[bi] >= thr)[0]
                js = js[all_ids[js] > all_ids[p]]  # pair order a < b
                out_a.extend([all_ids[p]] * len(js))
                out_b.extend(all_ids[js])
                out_s.extend(sims[bi, js])
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_s})

    return norm.select("id").mapInPandas(
        block_pairs, schema="id_a long, id_b long, cosine double"
    )
