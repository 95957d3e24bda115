"""Train/eval decontamination: flag training documents that share any
k-word shingle with an evaluation/benchmark set.

The standard LLM-training hygiene step (GPT-3 appendix C / PaLM-style
13-gram overlap): a training document containing a verbatim n-gram
from a benchmark is contamination — it inflates eval scores and must
be dropped or scrubbed before training. No reference-repo analogue
(the reference crawls and serves; it never trains) — this is part of
the training-data-pipeline surface the build brief adds on top.

Scale shape (the reason this is Spark-trivial and 100 TB-safe):

* the EVAL side is benchmarks — thousands of documents, at most a few
  million distinct shingles. Hashed to longs it is a few MB: always
  broadcast, never shuffled.
* the TRAIN side is the 100 TB corpus — but it only flows through a
  projection + explode + broadcast-hash-join (map-side, no exchange)
  into ONE per-doc aggregate whose partial (map-side combine) reduces
  every document to a single row before the only shuffle in the plan.
* ``explode_outer`` keeps zero-shingle documents (shorter than k
  tokens) in that same single pass — trivially uncontaminated rows,
  not silently dropped, and no second scan or repair join needed.

k=13 is the published convention for real corpora; the default here
stays parameterizable and the registered query uses k=3 because the
synthetic testdata documents are dozens of words, not thousands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions import text as X


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 13,
) -> DataFrame:
    """Per training document: how many of its distinct k-word shingles
    appear anywhere in ``eval_set``, and whether that count is > 0.

    Returns (id_col, n_shingles, n_contaminated, contaminated). A
    document with fewer than k tokens has n_shingles = 0 and is
    uncontaminated by definition (still present in the output).
    Matching is on xxhash64 of the shingle string — longs broadcast
    and compare cheaper than 50-100 byte shingles, and a 64-bit
    collision only ever flags a FALSE POSITIVE (safe direction for a
    filter that deletes training data).
    """
    eval_grams = (
        eval_set.select(
            F.explode(F.array_distinct(X.word_shingles(text_col, shingle_k))).alias("s")
        )
        .select(F.xxhash64("s").alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    grams = train.select(
        F.col(id_col),
        F.explode_outer(F.array_distinct(X.word_shingles(text_col, shingle_k))).alias("s"),
    ).select(
        id_col,
        # xxhash64(NULL) is the seed, not NULL — guard so the
        # explode_outer placeholder row can never match an eval gram
        F.when(F.col("s").isNotNull(), F.xxhash64("s")).alias("g"),
    )
    marked = grams.join(F.broadcast(eval_grams), "g", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("g").alias("n_shingles"),
            F.count("hit").alias("n_contaminated"),
        )
        .withColumn("contaminated", F.col("n_contaminated") > 0)
    )
