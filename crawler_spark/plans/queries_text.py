"""Text-analysis and dedup queries over ``documents`` (SURVEY.md §7 M5
/ the training-data-pipeline extensions): token statistics, document
fingerprinting, exact dedup, n-gram Jaccard near-dup pairs.

MinHash/SimHash/LSH live in ``operators/dedup.py``; the ones here are
fully SQL-expressible, so each has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark.functions import text as X
from crawler_spark.operators.shingles import shingle_hashes
from crawler_spark.plans.registry import register
from crawler_spark.sources import load_table

_TOKENS_SQL = "list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')"
_FP_SQL = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"


# --- token statistics per document ----------------------------------------
@register(
    "txt_token_stats",
    oracle=f"""
        SELECT doc_id,
               len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
                   AS n_ws_tokens,
               len({_TOKENS_SQL}) AS n_word_tokens,
               len(list_distinct({_TOKENS_SQL})) AS n_unique_tokens
        FROM documents
    """,
)
def txt_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.token_count("text").alias("n_ws_tokens"),
        X.word_token_count("text").alias("n_word_tokens"),
        F.size(F.array_distinct(X.tokenize("text"))).alias("n_unique_tokens"),
    )


# --- quality signals (length/whitespace ratios) ---------------------------
@register(
    "txt_quality_score",
    oracle=f"""
        SELECT doc_id,
               length(text) AS n_chars_actual,
               round(CAST(length(text) - length(regexp_replace(text, '\\s', '', 'g'))
                          AS DOUBLE) / greatest(length(text), 1), 6) AS ws_ratio,
               round(CAST(length(text) AS DOUBLE) /
                     greatest(len({_TOKENS_SQL}), 1), 6) AS chars_per_token
        FROM documents
    """,
)
def txt_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_ws = n_chars - F.length(F.regexp_replace("text", r"\s", ""))
    n_tok = X.word_token_count("text")
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_actual"),
        F.round(n_ws.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("ws_ratio"),
        F.round(n_chars.cast("double") / F.greatest(n_tok, F.lit(1)), 6)
        .alias("chars_per_token"),
    )


# --- document fingerprint (md5 of normalized text) ------------------------
@register(
    "txt_fingerprint",
    oracle=f"SELECT doc_id, {_FP_SQL} AS fp FROM documents",
)
def txt_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", X.fingerprint("text").alias("fp"))


# --- F8: base64 encode (reference embeddings.py:29-31) --------------------
@register(
    "f8_base64_content",
    oracle="SELECT doc_id, base64(encode(substr(text, 1, 32))) AS b64 FROM documents",
)
def f8_base64_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 as the built-in codegen expression: bytes → base64 string —
    the same packaging step the reference's vision path applies to
    image bytes (the UDF-side twin lives in vision_embed_udf)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.base64(F.encode(F.substring("text", 1, 32), "UTF-8")).alias("b64"),
    )


# --- exact dedup: canonical id per fingerprint group ----------------------
@register(
    "dedup_exact",
    oracle=f"""
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY {_FP_SQL}) AS canonical_id,
               (count(*) OVER (PARTITION BY {_FP_SQL})) > 1 AS is_duplicate
        FROM documents
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup verdict for EVERY row: the minimum doc_id of its
    fingerprint class plus an is_duplicate flag.

    Skew story (the txt_line_dedup lesson applied at doc granularity):
    the hottest fingerprint is, by the operator's own premise, the
    most-duplicated page on the web — empty bodies, error templates —
    with cluster sizes in the 10⁷s at 100 TB. An earlier form computed
    ``min/count OVER (PARTITION BY fp)``; WindowExec gets NO partial
    aggregation, so every copy of the hot fingerprint landed in one
    task. Now: ``groupBy(fp)`` (partial agg collapses each hot cluster
    to one row per map partition) then a shuffle equi-join back to
    re-attach per-doc rows — the join's probe side is still skewed on
    the hot fp, but AQE skew-join splits oversized partitions at
    runtime (joins get that mitigation; windows never do). Costs one
    more exchange than the window form at fixture scale, survives
    1000× where the window OOMs one task. The SQL oracle keeps the
    window formulation — same answer, independent derivation."""
    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select("doc_id", X.fingerprint("text").alias("fp"))
    groups = fps.groupBy("fp").agg(
        F.min("doc_id").alias("canonical_id"),
        (F.count(F.lit(1)) > 1).alias("is_duplicate"),
    )
    # null-safe key: PARTITION BY groups NULL fingerprints into one
    # class (both engines), so the join-back must match them too
    return fps.join(
        groups, fps["fp"].eqNullSafe(groups["fp"])
    ).select("doc_id", "canonical_id", "is_duplicate")


# --- n-gram Jaccard near-dup pairs ----------------------------------------
def ngram_jaccard_pairs(
    docs: DataFrame,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    metric: str = "jaccard",
) -> DataFrame:
    """Near-dup pairs by Jaccard over distinct k-word shingles.

    Scale path: the shingle⨝shingle equi-join only pairs documents that
    SHARE a shingle — sparse, shuffle keyed on the shingle string.

    ``max_shingle_df`` is the hot-shingle cap: shingles whose document
    frequency exceeds it are dropped from the self-join. A stopword-run
    shingle appearing in d documents contributes d² join rows while
    carrying no dedup signal — at 100 TB one hot key skews the whole
    shuffle. The hot set is tiny by construction (few shingles exceed
    any sane cap), so it broadcasts into a left_anti. Document sizes
    keep the UNCAPPED shingle counts, so for pairs that shared a
    dropped shingle the score is a (slight) lower bound on true
    Jaccard; pairs sharing only sub-cap shingles score identically.
    """
    # shingles join/shuffle on their xxhash64, not the string — longs
    # shuffle and compare far cheaper than 20-30 byte shingle strings,
    # and a 64-bit collision (≈(distinct shingles)²/2⁶⁵) is negligible.
    # The tokenize→shingle→distinct projection is the round-13 Arrow
    # kernel (operators/shingles.py, guide §4.2) — bit-identical rows
    # to the old explode(array_distinct(word_shingles)) expression
    # (tests/test_shingles.py), an order of magnitude cheaper per task
    # and a far smaller plan to compile; xxhash64 stays JVM-side.
    grams = shingle_hashes(docs, k=shingle_k)
    # Pack each shingle's doc list with ONE shuffle, then a double
    # explode emits the d(d-1)/2 in-group pairs with O(d) per-row memory
    # (no d²-element array, unlike a one-shot flatten; no second
    # shuffle, unlike a self-join — measured 40% faster at sf0.1).
    # Capped: lists over the cap are dropped whole before the explode
    # (hot shingles carry no dedup signal), bounding in-group pairs at
    # cap² — grams is scanned twice total (sizes + groups) instead of
    # 4× with a join + anti-join shape. Uncapped, a hot shingle still
    # contributes d² pair ROWS and a d-element packed array — exactness
    # costs that; the cap is the skew-safe shape for 100 TB.
    groups_all = grams.groupBy("g").agg(F.collect_list("doc_id").alias("ids"))
    # doc sizes derive from the UNFILTERED packed groups, not a second
    # scan of `grams`: both branches then hang off the same
    # hashpartitioning(g) exchange (ReusedExchange, plan-locked), so the
    # expensive tokenize→shingle→hash projection runs ONCE; the size
    # recount shuffles only packed longs.
    sizes = (
        groups_all.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    )
    group_pred = F.size("ids") >= 2
    if max_shingle_df is not None:
        group_pred = group_pred & (F.size("ids") <= max_shingle_df)
    groups = groups_all.filter(group_pred)
    common = (
        groups.select(F.explode("ids").alias("id_a"), "ids")
        .select(
            "id_a",
            F.explode(F.filter("ids", lambda y: y > F.col("id_a"))).alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    if metric == "containment":
        # shared / min(|A|,|B|): 1.0 when the smaller doc's shingles are
        # a subset of the larger's — catches quote-inside-article and
        # boilerplate-wrapped near-supersets whose symmetric Jaccard is
        # diluted by the size gap (Broder 1997's resemblance vs
        # containment distinction).
        score = F.col("shared").cast("double") / F.least("na", "nb")
        out_col = "containment"
    else:
        score = F.col("shared").cast("double") / (
            F.col("na") + F.col("nb") - F.col("shared")
        )
        out_col = "jaccard"
    return (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .filter(score >= threshold)
        .select("id_a", "id_b", F.round(score, 6).alias(out_col))
    )


# Shared by the exact query and (on testdata, where no shingle's document
# frequency reaches the cap — max df is 25 at sf0.1, 7 at sf0.01 — so the
# cap provably never binds and capped == exact) by the capped variant.
# The threshold is a named placeholder rendered by _ngram_pairs_oracle —
# NOT string-replaced — so adding another 0.5 literal to the template
# can never silently corrupt a derived oracle.
_NGRAM_PAIRS_ORACLE_TMPL = f"""
        WITH grams AS (
            SELECT doc_id, unnest(list_distinct(
                list_transform(generate_series(1, greatest(len({_TOKENS_SQL}) - 2, 0)),
                               i -> array_to_string({_TOKENS_SQL}[i:i+2], ' '))
            )) AS g
            FROM documents
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= {{threshold}}
    """


def _ngram_pairs_oracle(threshold: float) -> str:
    return _NGRAM_PAIRS_ORACLE_TMPL.format(threshold=threshold)


@register("dedup_ngram_jaccard", oracle=_ngram_pairs_oracle(0.5))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact baseline: no cap, so the score is true Jaccard and the
    DuckDB oracle matches value-for-value."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.5)


def jaccard_pairs_prefix_filtered(
    docs: DataFrame,
    shingle_k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT Jaccard pairs via prefix filtering (SSJoin, Chaudhuri et
    al. ICDE'06; the prefix principle behind PPJoin, Xiao et al.
    WWW'08) — same answer as ``ngram_jaccard_pairs`` uncapped, third
    physical strategy beside the all-shingle join and the lossy
    MinHash banding: candidates come only from each document's PREFIX
    under a global rarest-first token order.

    Why it's lossless: order every shingle by (document frequency,
    hash) and sort each doc's shingle set by that order; with prefix
    length π(x) = |x| − ⌈t·|x|⌉ + 1, any pair with Jaccard ≥ t must
    overlap in ≥ ⌈t·|x|⌉ tokens of EACH set, and a set's last |x| − π
    tokens alone cannot hold that much overlap — so two docs whose
    prefixes share nothing are provably below threshold and are never
    even paired. Verification computes true Jaccard on the surviving
    candidates only (array_intersect over the packed sorted sets,
    JVM-side).

    Scale shape: one df-count shuffle, one candidate shuffle keyed on
    PREFIX tokens — by construction the globally RAREST ones, so the
    candidate groups are the smallest in the corpus and need no hot-key
    cap — then two id-keyed joins to fetch the packed sets for the
    candidate pairs. Pruning sharpens with the threshold (π shrinks as
    t grows): at t=0.9 the prefix is ~10% of each set; at t=0.5 it is
    ~half. The complement of the capped variant: capping trades recall
    for boundedness, prefix filtering keeps exactness and bounds the
    join by rarity instead.
    """
    grams = shingle_hashes(
        docs, text_col=text_col, id_col=id_col, k=shingle_k, out_id="doc_id"
    )
    df_counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    # pack each doc's set SORTED by (df, g): the shared global order the
    # prefix principle requires; (df, g) is a total order because g is
    # unique per token
    # packed once, MATERIALIZED once: four consumers hang off this frame
    # (prefix explode, candidate join, both verify sides) — composing
    # lazily would recompute the shingle+df pipeline per consumer
    # (measured 111 s → ~8 s at sf0.1 from exactly this). The sort key
    # is the struct (df, g); only the g longs are kept, already in
    # global rarest-first order.
    per_doc = (
        grams.join(df_counts, "g")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("df"), F.col("g")))
                ),
                lambda x: x["g"],
            ).alias("toks")
        )
        .select("doc_id", "toks", F.size("toks").alias("n"))
        .select(
            "doc_id", "toks", "n",
            (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
            .cast("int").alias("pi"),
        )
        .localCheckpoint()
    )
    prefix = per_doc.select(
        "doc_id",
        F.explode(F.slice("toks", F.lit(1), F.col("pi"))).alias("g"),
    )
    # rarest-first groups: pack-and-explode like the exact path, but the
    # group sizes here are bounded by the prefix tokens' rarity
    cand = (
        prefix.groupBy("g").agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode("ids").alias("id_a"), "ids")
        .select(
            "id_a",
            F.explode(F.filter("ids", lambda y: y > F.col("id_a")))
            .alias("id_b"),
        )
        .distinct()
    )
    a = per_doc.select(
        F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"),
        F.col("n").alias("na"),
    )
    b = per_doc.select(
        F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"),
        F.col("n").alias("nb"),
    )
    shared = F.size(F.array_intersect("ta", "tb"))
    score = shared.cast("double") / (F.col("na") + F.col("nb") - shared)
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .filter(score >= threshold)
        .select("id_a", "id_b", F.round(score, 6).alias("jaccard"))
    )


@register(
    "dedup_ngram_jaccard_prefix",
    # same oracle as the exact query, at the high-similarity threshold
    # where prefix filtering earns its keep (prefix length ≈ 0.2·|set|)
    oracle=_ngram_pairs_oracle(0.8),
)
def dedup_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact Jaccard — identical answers to the
    all-shingle join at the same threshold (the oracle is the same SQL,
    and tests/test_dedup.py asserts path equality across thresholds),
    reached through the rarest-first prefix candidate join. Registered
    at t=0.8, the near-dup-delete threshold, where the prefix is ~20%
    of each set; at t=0.5 the all-shingle join wins on corpora whose
    shingles are already near-unique. See
    ``jaccard_pairs_prefix_filtered``."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs_prefix_filtered(docs, shingle_k=3, threshold=0.8)


@register(
    "dedup_containment",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id, unnest(list_distinct(
                list_transform(generate_series(1, greatest(len({_TOKENS_SQL}) - 2, 0)),
                               i -> array_to_string({_TOKENS_SQL}[i:i+2], ' '))
            )) AS g
            FROM documents
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(CAST(shared AS DOUBLE) / least(sa.n, sb.n), 6) AS containment
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(shared AS DOUBLE) / least(sa.n, sb.n) >= 0.7
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: shared / min-size (Broder 1997 containment)
    instead of symmetric Jaccard — a short doc fully quoted inside a
    long one scores 1.0 here but can fall under any Jaccard threshold
    as the length gap grows. Same shingle machinery, same single
    groupBy(gram) shuffle; only the final broadcast-joined score
    expression differs."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, shingle_k=3, threshold=0.7, metric="containment"
    )


# --- canonical ids over the near-dup graph (full transitive closure) ------
_CANONICAL_ORACLE = f"""
        WITH RECURSIVE grams AS (
            SELECT doc_id, unnest(list_distinct(
                list_transform(generate_series(1, greatest(len({_TOKENS_SQL}) - 2, 0)),
                               i -> array_to_string({_TOKENS_SQL}[i:i+2], ' '))
            )) AS g
            FROM documents
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT id_a, id_b FROM common
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5
        ),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs
        ),
        reach(id, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u
        )
        SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id
    """


@register("dedup_canonical", oracle=_CANONICAL_ORACLE)
def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical id per document over the n-gram near-dup graph, full
    transitive closure (iterative min-label propagation — an
    iterative distributed algorithm matched value-for-value against a
    DuckDB RECURSIVE CTE oracle)."""
    from crawler_spark.operators.dedup import canonical_closure

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.5)
    return canonical_closure(pairs, docs, "doc_id").select(
        F.col("id").alias("doc_id"), "canonical_id"
    )


@register("dedup_ngram_jaccard_capped", oracle=_ngram_pairs_oracle(0.5))
def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path: identical to dedup_ngram_jaccard except shingles
    with document frequency > 50 never enter the self-join (hot-key
    skew guard). On data where some shingle exceeds the cap the score
    is a lower bound (approximate by design); on the testdata no
    shingle comes close (max df 25 at sf0.1), so capped == exact and
    the exact oracle applies verbatim — tests/test_dedup.py proves the
    pair-identity independently."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.5, max_shingle_df=50)
        .orderBy("id_a", "id_b")
    )


@register("dedup_canonical_capped", oracle=_CANONICAL_ORACLE)
def dedup_canonical_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB shape of ``dedup_canonical`` end-to-end: the same
    transitive closure composed over the HOT-SHINGLE-CAPPED pair
    generator, so no stage of the pipeline carries the d²-per-hot-
    shingle skew the exact baseline accepts for oracle parity.
    tests/test_dedup.py proves the closure's components are identical
    to the exact variant on the testdata (where no shingle exceeds the
    cap, the pair sets — and hence components — coincide), which is
    also why the exact closure oracle applies verbatim here."""
    from crawler_spark.operators.dedup import canonical_closure

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.5, max_shingle_df=50)
    return canonical_closure(pairs, docs, "doc_id").select(
        F.col("id").alias("doc_id"), "canonical_id"
    )


@register("dedup_canonical_star", oracle=_CANONICAL_ORACLE)
def dedup_canonical_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_canonical_capped`` with the closure swapped for the
    alternating large-star/small-star algorithm (operators/dedup.py:
    connected_components_star) — O(log chain-length) shuffle rounds
    instead of min-label propagation's O(chain-length), the shape that
    survives serially-edited boilerplate chains at corpus scale. Same
    components, same oracle: the RECURSIVE-CTE closure oracle applies
    verbatim because the algorithms compute the identical fixed point
    (tests/test_dedup.py proves label equality on random graphs)."""
    from crawler_spark.operators.dedup import connected_components_star

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.5, max_shingle_df=50)
    return connected_components_star(pairs, docs, "doc_id").select(
        F.col("id").alias("doc_id"), "canonical_id"
    )


# --- train/eval decontamination -------------------------------------------
@register(
    "decontaminate_eval_overlap",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, list_distinct(
                list_transform(generate_series(1, greatest(len({_TOKENS_SQL}) - 2, 0)),
                               i -> array_to_string({_TOKENS_SQL}[i:i+2], ' '))
            ) AS shingles
            FROM documents
        ),
        eval_g AS (
            SELECT DISTINCT unnest(shingles) AS g FROM sh WHERE doc_id % 20 = 0
        ),
        train AS (SELECT doc_id, shingles FROM sh WHERE doc_id % 20 <> 0),
        grams AS (SELECT doc_id, unnest(shingles) AS g FROM train),
        hits AS (
            SELECT t.doc_id, count(*) AS n FROM grams t JOIN eval_g USING (g)
            GROUP BY 1
        )
        SELECT t.doc_id,
               CAST(len(t.shingles) AS BIGINT) AS n_shingles,
               CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated,
               coalesce(h.n, 0) > 0 AS contaminated
        FROM train t LEFT JOIN hits h USING (doc_id)
    """,
)
def decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination (operators/decontam.py): documents
    with doc_id % 20 == 0 stand in for the benchmark set; every other
    document is scored by how many of its distinct 3-word shingles
    appear anywhere in that set. One broadcast join + one per-doc
    aggregate — the eval side broadcasts, the corpus side never
    shuffles until it is one row per document. k=3 here because the
    synthetic docs are short; production uses the published k=13."""
    from crawler_spark.operators.decontam import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 20 == 0
    return decontaminate(
        docs.filter(~is_eval), docs.filter(is_eval), shingle_k=3
    )


# --- span-level exact-substring decontamination ---------------------------
_SPAN_L = 30       # window length (chars)
_SPAN_STRIDE = 7   # train-side sampling stride


@register(
    "decontam_exact_spans",
    oracle=f"""
        WITH ev AS (
            SELECT DISTINCT substr(text, CAST(i AS INTEGER), {_SPAN_L}) AS s
            FROM (SELECT text,
                         unnest(generate_series(
                             1, greatest(length(text) - {_SPAN_L - 1}, 0))) AS i
                  FROM documents WHERE doc_id % 20 = 0)
        ),
        tr AS (
            SELECT doc_id, i AS pos,
                   substr(text, CAST(i AS INTEGER), {_SPAN_L}) AS s
            FROM (SELECT doc_id, text,
                         unnest(generate_series(
                             1, greatest(length(text) - {_SPAN_L - 1}, 0),
                             {_SPAN_STRIDE})) AS i
                  FROM documents WHERE doc_id % 20 <> 0)
        )
        SELECT doc_id, CAST(pos AS BIGINT) AS pos
        FROM tr JOIN ev USING (s)
        ORDER BY doc_id, pos
    """,
)
def decontam_exact_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level EXACT-SUBSTRING decontamination (the character-level
    companion to the shingle-based ``decontaminate``, after the
    exact-substring criterion of Lee et al. 2022, arXiv:2107.06499):
    report every sampled train-doc offset whose {_SPAN_L}-char window
    appears verbatim anywhere in the eval set — positions, not just a
    per-doc flag, so the spans can be SCRUBBED instead of dropping the
    whole document.

    Guarantee: eval windows at stride 1, train windows at stride
    {_SPAN_STRIDE} — any shared substring of length >= L + stride - 1
    (= {_SPAN_L + _SPAN_STRIDE - 1} chars) is caught regardless of
    alignment, at 1/{_SPAN_STRIDE} the corpus-side blowup of full
    sliding windows.

    Scale shape: see operators/decontam.py contaminated_spans — eval
    windows broadcast, corpus side is a bounded explode into a
    broadcast-hash join, no corpus shuffle; string equality on the
    join key IS the verification (no hash false-positives)."""
    from crawler_spark.operators.decontam import contaminated_spans

    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 20 == 0
    return contaminated_spans(
        docs.filter(~is_eval), docs.filter(is_eval),
        span_len=_SPAN_L, stride=_SPAN_STRIDE,
    ).orderBy("doc_id", "pos")


# --- F2: tokenization as a first-class projection -------------------------
@register(
    "f2_query_tokens",
    oracle=f"""
        SELECT doc_id,
               coalesce(array_to_string({_TOKENS_SQL}[1:5], '|'), '')
                   AS first_tokens,
               len({_TOKENS_SQL}) AS n_tokens
        FROM documents
    """,
)
def f2_query_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 (reference search.py:103 re.findall(r'\\w+', lower)) surfaced
    as its own oracle query. The first-5-token slice is projected to a
    '|'-joined STRING (tokens are \\w+ so the delimiter cannot collide):
    the driver's canonicalizer hashes scalar cells only, and a top-level
    ARRAY column dies in pandas sort_values (round-3 harness error).
    Element-wise array semantics stay covered by local tests that split
    the string back."""
    docs = load_table(spark, sf_dir, "documents")
    toks = X.tokenize("text")
    return docs.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 5), "|").alias("first_tokens"),
        F.size(toks).alias("n_tokens"),
    )


# --- array-valued aggregation: sorted distinct sources per language -------
@register(
    "agg_sources_per_lang",
    oracle="""
        SELECT lang,
               coalesce(array_to_string(
                   list_sort(list(DISTINCT source)), '|'), '') AS sources,
               count(DISTINCT source) AS n_sources
        FROM documents
        GROUP BY lang ORDER BY lang
    """,
)
def agg_sources_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued aggregation (collect_set → sort_array), projected to
    a '|'-joined STRING so the driver canonicalizer can hash the cell
    (top-level arrays broke it in round 3); ordering inside the string
    is the sorted-distinct order, so the comparison is still element-
    for-element. collect_set's partial aggregation dedups map-side, so
    the shuffle carries distinct values only."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("source")), "|").alias("sources"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


# --- Count-Min-Sketch frequency estimation --------------------------------
_CMS_D, _CMS_W = 4, 256


@register(
    "txt_heavy_hitters_cms",
    oracle=f"""
        WITH tok AS (
            SELECT u.t AS tok
            FROM (SELECT {_TOKENS_SQL} AS ts FROM documents), unnest(ts) AS u(t)
        ),
        hashed AS (
            SELECT tok, s.s AS seed,
                   ('0x' || substr(md5(tok || ':' || s.s), 1, 8))::BIGINT
                       % {_CMS_W} AS bucket
            FROM tok, unnest(generate_series(0, {_CMS_D - 1})) AS s(s)
        ),
        cms AS (
            SELECT seed, bucket, count(*) AS cnt
            FROM hashed GROUP BY seed, bucket
        ),
        est AS (
            SELECT h.tok, min(cms.cnt) AS cms_estimate
            FROM (SELECT DISTINCT tok, seed, bucket FROM hashed) h
            JOIN cms USING (seed, bucket)
            GROUP BY h.tok
        ),
        exact AS (SELECT tok, count(*) AS exact_count FROM tok GROUP BY tok)
        SELECT est.tok, est.cms_estimate, exact.exact_count,
               est.cms_estimate - exact.exact_count AS overestimate
        FROM est JOIN exact USING (tok)
        ORDER BY exact.exact_count DESC, est.tok
        LIMIT 30
    """,
)
def txt_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch frequency estimation (Cormode & Muthukrishnan
    2005) next to the exact `txt_heavy_hitters`: d=4 seeded hash rows
    × w=256 buckets, every token increments one bucket per row, a
    token's estimate is the MIN over its d buckets — never an
    underestimate, over by at most the collision mass (ε ≈ e/w of the
    stream) w.h.p.

    The 100 TB point: the exact heavy-hitter agg keys on the full
    vocabulary (unbounded — URLs, typos, code make token cardinality
    grow with the corpus), while the CMS table is d·w rows by
    CONFIGURATION, mergeable across partitions/days exactly like the
    HLL rollup (`ev_hll_distinct_rollup`), and queryable for ANY
    candidate after the fact. The hash is md5-derived so both engines
    compute identical buckets (`F.conv` ↔ '0x'::BIGINT, the
    shard-assignment convention). Note the estimate-vs-exact gap is
    part of the output: `overestimate >= 0` is the CMS guarantee,
    asserted row-wise by the oracle and tests."""
    docs = load_table(spark, sf_dir, "documents")
    return cms_token_counts(docs, d=_CMS_D, w=_CMS_W).limit(30)


def cms_token_counts(docs: DataFrame, d: int, w: int) -> DataFrame:
    """The CMS plan behind ``txt_heavy_hitters_cms``, parameterized so
    tests can shrink ``w`` to force collisions and check the
    one-sided-error guarantee.

    Round-13 restructure (guide §2.4): the sketch is built from the
    EXACT per-token counts instead of the raw occurrence stream. A
    bucket's count is Σ over tokens of count(tok)·[h(tok,seed)=bucket],
    so aggregating occurrences to (tok, count) FIRST — one map-side-
    combined shuffle the query needs anyway for its `exact_count`
    column — and then summing counts into buckets yields the identical
    sketch while hashing each DISTINCT token d times instead of each
    OCCURRENCE d times (the old plan md5'd the token stream ×d and
    paid a dropDuplicates shuffle over it to de-dup estimates; both
    are gone — 4 shuffles → 2, both vocab-bounded)."""
    tok = docs.select(F.explode(X.tokenize("text")).alias("tok"))
    exact = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_count"))
    seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    hashed = exact.select("tok", "exact_count", seeds).select(
        "tok", "exact_count", "seed",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", "tok", "seed")), 1, 8), 16, 10
            ).cast("long"),
            F.lit(w),
        ).alias("bucket"),
    )
    cms = hashed.groupBy("seed", "bucket").agg(
        F.sum("exact_count").alias("cnt"))
    est = (
        hashed.join(F.broadcast(cms), ["seed", "bucket"])
        .groupBy("tok", "exact_count")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return (
        est.select(
            "tok", "cms_estimate", "exact_count",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.col("exact_count").desc(), "tok")
    )


# --- recrawl change detection ---------------------------------------------
@register(
    "crawl_change_detection",
    oracle=f"""
        WITH a AS (
            SELECT doc_id, {_FP_SQL} AS fp FROM documents
        ),
        b AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0
                        THEN md5(trim(regexp_replace(lower(text || ' updated'),
                                                     '\\s+', ' ', 'g')))
                        ELSE {_FP_SQL} END AS fp
            FROM documents WHERE doc_id % 13 <> 0
            UNION ALL
            SELECT doc_id + 1000000, {_FP_SQL} FROM documents
            WHERE doc_id % 11 = 0
        )
        SELECT status, count(*) AS n FROM (
            SELECT CASE WHEN a.doc_id IS NULL THEN 'new'
                        WHEN b.doc_id IS NULL THEN 'gone'
                        WHEN a.fp = b.fp THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        ) GROUP BY status
    """,
)
def crawl_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl delta classification — the query an incremental crawler
    schedules from: two snapshots full-outer-joined on the page key,
    rows classified new / gone / changed / unchanged by normalized
    content fingerprint (the same md5 fingerprint the dedup family
    keys on, so 'changed' means real content change, not whitespace).
    The second snapshot here is synthesized deterministically from the
    first (every 7th doc edited, every 13th dropped, every 11th
    re-added under a new id) so both engines see identical inputs.

    Scale shape: ONE equi-join on the page key — the textbook case for
    the bucketed layout (sources/bucketed.py): snapshots bucketed by
    url join with zero exchange, and the fingerprint projection means
    the join carries 2 columns, not page bodies. Change rates feed
    recrawl frequency per domain (the reference's last_crawled upsert
    is the write-side of this read)."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select("doc_id", X.fingerprint("text").alias("fp"))
    changed_fp = X.fingerprint(F.concat(F.col("text"), F.lit(" updated")))
    b = (
        docs.filter(F.col("doc_id") % 13 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 7 == 0, changed_fp)
            .otherwise(X.fingerprint("text")).alias("fp"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 11 == 0)
            .select((F.col("doc_id") + 1000000).alias("doc_id"),
                    X.fingerprint("text").alias("fp"))
        )
    )
    joined = a.alias("a").join(
        b.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer")
    status = (
        F.when(F.col("a.doc_id").isNull(), "new")
        .when(F.col("b.doc_id").isNull(), "gone")
        .when(F.col("a.fp") == F.col("b.fp"), "unchanged")
        .otherwise("changed")
    )
    return joined.select(status.alias("status")).groupBy("status").agg(
        F.count(F.lit(1)).alias("n"))
