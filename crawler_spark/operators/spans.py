"""Cross-document duplicated-span detection and removal.

The exact-substring dedup tier (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better"): find every token span
that appears verbatim in MORE THAN ONE document, at ANY alignment,
and optionally rewrite the corpus so only the first document keeps
the shared text. ``dedup_repeated_spans`` (operators/dedup.py) is the
block-aligned cousin — it partitions text into fixed non-overlapping
windows, so a duplicate shifted by one token escapes it; here every
token position starts a sliding k-gram, so a shared run of >= k
tokens is caught wherever it sits, and overlapping hits merge into
maximal spans per document with a gaps-and-islands window.

Spark-first shape — Lee et al. build a single-node suffix array,
which has no distributed analogue worth imitating; the equivalent
result for fixed k comes from three fine-grained-key exchanges:
  1. one groupBy on the 64-bit gram hash to find grams present in
     >= 2 documents (partial aggregation absorbs the heavy tail:
     a gram's count combines map-side before it travels);
  2. one shuffle join of positions against that duplicated-gram set
     (both sides keyed on the hash; no broadcast — at 100 TB the
     duplicated-gram set is itself huge);
  3. one per-document window for the interval merge (state bounded
     by document length, never corpus-global).
Grams travel as xxhash64 longs, not k-word strings — detection is
advisory (a span report), so a 2^-64 collision mislabels one span
and deletes AT WORST k real tokens from one doc, the acceptable
direction for this tier (the destructive rewrite in
``dedup_repeated_spans`` deliberately keys on exact strings instead;
see its docstring for the converse argument).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions import text as X


def positional_gram_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """(id, pos, g): a 64-bit hash of the k-token shingle starting at
    each 0-based token position. Documents shorter than k tokens emit
    no rows."""
    # explode(array(tokens)) is a Generate barrier: `tk` becomes a
    # plain attribute, so the per-position slice below indexes a
    # materialized array instead of re-running tokenize per position
    # (the CollapseProject O(len²) inlining trap — see
    # operators/dedup.py dedup_repeated_spans).
    tokd = df.select(
        F.col(id_col), F.explode(F.array(X.tokenize(text_col))).alias("tk")
    )
    # sequence(0, n-k) DESCENDS when n < k (sequence(0,-1) = [0,-1]),
    # so short docs need the explicit empty-array branch.
    grams = F.when(
        F.size("tk") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("tk") - k),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("tk"), i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return tokd.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "g")
    )


def _merge_islands(
    hits: DataFrame, id_col: str, k: int
) -> DataFrame:
    """Merge overlapping/adjacent k-token hit intervals per document:
    hits at positions p, q (p < q) belong to one maximal span when
    q <= p + k (the intervals [p, p+k-1], [q, q+k-1] overlap or abut).
    Classic gaps-and-islands over a per-doc window — running sum of
    gap-break flags names the island, one groupBy emits the span."""
    w = Window.partitionBy(id_col).orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(w)
    isl = hits.select(id_col, "pos").withColumn(
        "island",
        F.sum(F.when(gap.isNull() | (gap > k), 1).otherwise(0)).over(w),
    )
    return (
        isl.groupBy(id_col, "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def crossdoc_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    keep_first_doc: bool = False,
) -> DataFrame:
    """Maximal token spans duplicated across >= 2 documents.

    Returns (id, span_start, span_end, span_tokens), 0-based inclusive
    token indexes. With ``keep_first_doc`` the lowest doc id sharing a
    gram keeps its text (no span reported there) — the deterministic
    keep-first-wins convention every destructive tier in this repo
    uses — while by default ALL holders report their spans (the
    diagnostic view)."""
    grams = positional_gram_hashes(df, text_col, id_col, k)
    dup = (
        grams.groupBy("g")
        .agg(
            F.count_distinct(id_col).alias("ndocs"),
            F.min(id_col).alias("keeper"),
        )
        .where(F.col("ndocs") >= 2)
        .select("g", "keeper")
    )
    hits = grams.join(dup, "g")
    if keep_first_doc:
        hits = hits.where(F.col(id_col) > F.col("keeper"))
    return _merge_islands(hits, id_col, k)


def remove_crossdoc_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Rewrite the corpus with cross-document duplicated spans removed
    from every holder EXCEPT the first (lowest-id) document — the
    content survives exactly once.

    Returns (id, clean_text, n_tokens, n_removed). Docs not holding
    any duplicated span pass through verbatim (modulo the tokenizer's
    whitespace normalisation, applied uniformly so the output column
    is one consistent representation).

    The drop-set per document is a sorted position array bounded by
    the document's own length — spans are disjoint by construction
    (islands merged), so the explode emits each dropped position once,
    the per-doc array needs no distinct, and ``n_removed`` is simply
    its size. The rewrite keeps positions via ONE hash-based
    ``array_except`` over the index range — O(tokens + dropped) per
    doc, where a per-token ``array_contains`` scan of the drop array
    was O(tokens × dropped) and was evaluated twice (once for the
    text, once for the removed count)."""
    spans = crossdoc_duplicate_spans(df, text_col, id_col, k, keep_first_doc=True)
    drops = (
        spans.select(
            id_col, F.explode(F.sequence("span_start", "span_end")).alias("p")
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("p")).alias("drop"))
    )
    no_drop: Column = F.array().cast("array<bigint>")
    drop_arr = F.coalesce(F.col("drop"), no_drop)

    def _rewrite(tks: Column) -> Column:
        n = F.size(tks)
        kept_pos = F.when(
            n > 0,
            F.array_except(
                F.sequence(F.lit(0).cast("long"), (n - 1).cast("long")),
                drop_arr,
            ),
        ).otherwise(no_drop)
        return F.struct(
            F.concat_ws(
                " ",
                F.transform(kept_pos,
                            lambda p: F.element_at(tks, (p + 1).cast("int"))),
            ).alias("clean_text"),
            n.cast("long").alias("n_tokens"),
            F.size(drop_arr).cast("long").alias("n_removed"),
        )

    return (
        df.join(drops, id_col, "left")
        .select(F.col(id_col), X.bind_once(X.tokenize(text_col), _rewrite)
                .alias("s"))
        .select(id_col, "s.clean_text", "s.n_tokens", "s.n_removed")
    )


def crossdoc_spans_vs_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Incremental form of ``crossdoc_duplicate_spans`` for the
    continuous-crawl pipeline: maximal spans in BATCH documents whose
    every k-gram already exists somewhere in CORPUS — the corpus always
    keeps its text, the new batch reports (and downstream drops) what
    it re-crawled. Batch-vs-batch duplication is deliberately out of
    scope here (run the full operator on the batch for that).

    Scale shape (same physics as ``dedup_incremental``): the batch's
    gram set is bounded by the batch size BY CONSTRUCTION — a crawl
    increment, not a corpus — so it broadcasts, and corpus grams
    stream through the broadcast-hash join map-side with NO corpus
    shuffle. Only matched rows (bounded by batch grams × their corpus
    df) reach the distinct + per-doc window."""
    bg = positional_gram_hashes(batch, text_col, id_col, k)
    cg = positional_gram_hashes(corpus, text_col, id_col, k).select("g")
    hits = (
        cg.join(F.broadcast(bg), "g")
        .select(id_col, "pos")
        .distinct()
    )
    return _merge_islands(hits, id_col, k)
