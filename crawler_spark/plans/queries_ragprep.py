"""RAG / training-data preparation queries over ``documents``: fixed-
window chunking, PII redaction, Gopher-style quality gates, inverted-
index postings, and a compression-ratio quality signal.

These extend the curation family (queries_curation.py) with the
remaining ops a large-scale text-pipeline user expects. All but the
compression ratio are pure JVM expressions with DuckDB oracles; the
compression ratio needs zlib (no SQL equivalent in either engine) so it
is an Arrow-batched mapInPandas with a rows-only driver check plus a
deterministic unit test.

Scale notes (100 TB):
  * chunking is a per-row explode — no shuffle at all; output rows ≈
    input_chars / stride, partition sizes grow by the same factor, so
    pair with ``spark.sql.files.maxPartitionBytes`` tuning, not a
    repartition;
  * PII redaction / quality gates are pure projections — no shuffle;
  * the inverted index caps postings BEFORE any collect_list: a
    row_number window per token keeps the 20 smallest doc_ids, so the
    state per token is bounded even for "the"-class tokens that appear
    in every document (collect-then-slice would OOM on those);
  * compression ratio is mapInPandas over Arrow batches — embarrassingly
    parallel, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.functions import text as X
from crawler_spark.plans.queries_text import _TOKENS_SQL
from crawler_spark.plans.oracle_pins import pin_kwargs as _PINS_KW
from crawler_spark.plans.registry import register
from crawler_spark.sources import load_table

CHUNK_LEN = 500
CHUNK_STRIDE = 400  # 100-char overlap between consecutive chunks


# --- fixed-window overlapping chunking (RAG prep) -------------------------
@register(
    "doc_chunks",
    oracle=f"""
        WITH starts AS (
            SELECT doc_id, text,
                   unnest(generate_series(1, length(text), {CHUNK_STRIDE}))
                       AS chunk_start
            FROM documents
            WHERE length(text) >= 1
        )
        SELECT doc_id,
               CAST((chunk_start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
               CAST(chunk_start AS BIGINT) AS chunk_start,
               substr(text, CAST(chunk_start AS BIGINT), {CHUNK_LEN}) AS chunk_text,
               CAST(length(substr(text, CAST(chunk_start AS BIGINT), {CHUNK_LEN}))
                    AS BIGINT) AS chunk_len
        FROM starts
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunks: windows of CHUNK_LEN chars every
    CHUNK_STRIDE chars, starting at 1, while the start is inside the
    document. Pure explode — no shuffle; chunk_id is the 0-based
    ordinal. Short docs yield exactly one (possibly short) chunk."""
    docs = load_table(spark, sf_dir, "documents")
    starts = F.sequence(F.lit(1), F.length("text"), F.lit(CHUNK_STRIDE))
    exploded = (
        docs.where(F.length("text") >= 1)
        .select("doc_id", "text",
                F.posexplode(starts).alias("chunk_id", "chunk_start"))
    )
    chunk = F.substr("text", F.col("chunk_start"), F.lit(CHUNK_LEN))
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("chunk_len"),
    )


# --- PII detection + redaction --------------------------------------------
# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): classes, bounded repeats, \b, \d.
_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP_PAT = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@register(
    "txt_pii_redact",
    oracle=f"""
        WITH seeded AS (
            SELECT doc_id,
                   text || ' Contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or 10.'
                        || CAST(doc_id % 256 AS VARCHAR) || '.0.1 now.'
                       AS with_pii
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(with_pii, '{_EMAIL_PAT}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(with_pii, '{_IP_PAT}')) AS BIGINT)
                   AS n_ips,
               md5(regexp_replace(regexp_replace(with_pii,
                       '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                       '{_IP_PAT}', '<IP>', 'g')) AS redacted_fp
        FROM seeded
    """,
)
def txt_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and redact emails / IPv4 addresses. The synthetic corpus
    contains no natural PII, so a deterministic per-row PII suffix is
    seeded first — the oracle then genuinely exercises both engines'
    regex match + global replace on every row. Redacted text is compared
    by md5 fingerprint (full text would bloat the hash input)."""
    docs = load_table(spark, sf_dir, "documents")
    with_pii = F.concat(
        F.col("text"), F.lit(" Contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com or 10."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".0.1 now."),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(with_pii, _EMAIL_PAT, "<EMAIL>"), _IP_PAT, "<IP>")
    return docs.select(
        "doc_id",
        F.regexp_count(with_pii, F.lit(_EMAIL_PAT)).cast("long").alias("n_emails"),
        F.regexp_count(with_pii, F.lit(_IP_PAT)).cast("long").alias("n_ips"),
        F.md5(redacted).alias("redacted_fp"),
    )


# --- Gopher-style quality gates -------------------------------------------
_STOPWORDS = ["the", "of", "and", "to", "in", "a", "is", "that"]
# Composite-pass thresholds, shared with the composed filter-overlap
# oracle (queries_curation.py) so a tuning change cannot diverge them.
_GOPHER_MIN_WORDS = 20
_GOPHER_WORD_LEN_LO = 3
_GOPHER_WORD_LEN_HI = 10
# the pass predicate over the sig CTE's columns, verbatim in both
# consumers (sig must expose n_words, n_ws/n_nonws-derived mean, and
# stopword_hits — see each oracle)
_GOPHER_PASS_SQL = (
    f"(n_words >= {_GOPHER_MIN_WORDS} "
    f"AND CAST(n_chars - n_ws AS DOUBLE) / greatest(n_words, 1) "
    f"BETWEEN {_GOPHER_WORD_LEN_LO} AND {_GOPHER_WORD_LEN_HI} "
    f"AND stopword_hits >= 1)"
)


@register(
    "txt_gopher_rules",
    oracle=f"""
        WITH sig AS (
            SELECT doc_id,
                   len(list_filter(string_split_regex(text, '\\s+'),
                                   t -> t <> '')) AS n_words,
                   length(text)
                     - length(regexp_replace(text, '\\s', '', 'g')) AS n_ws,
                   length(text) AS n_chars,
                   length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))
                       AS n_alnum_ws,
                   len(list_intersect(list_distinct({_TOKENS_SQL}),
                       [{", ".join(repr(s) for s in _STOPWORDS)}]))
                       AS stopword_hits
            FROM documents
        )
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               round(CAST(n_chars - n_ws AS DOUBLE)
                     / greatest(n_words, 1), 6) AS mean_word_len,
               round(CAST(n_chars - n_alnum_ws AS DOUBLE)
                     / greatest(n_chars, 1), 6) AS symbol_ratio,
               CAST(stopword_hits AS BIGINT) AS stopword_hits,
               {_GOPHER_PASS_SQL} AS passes
        FROM sig
    """,
)
def txt_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality gates (Rae et al. 2021 §A1.1 style): word
    count, mean word length, symbol ratio, stopword presence, and the
    composite pass flag. Pure projection — no shuffle, codegen-friendly."""
    docs = load_table(spark, sf_dir, "documents")
    # two-stage select: the tokenize/regex metrics feed several
    # outputs each, and with the tokenize HOF blocking codegen CSE
    # every reference re-scanned the text — compute each metric ONCE,
    # then derive outputs from the attributes (CollapseProject keeps
    # multi-referenced non-cheap aliases in their own projection)
    m = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.length(F.regexp_replace("text", r"\s", "")).alias("n_nonws"),
        X.token_count("text").alias("n_words"),
        F.length(F.regexp_replace("text", r"[^A-Za-z0-9\s]", ""))
        .alias("n_alnum_ws"),
        F.size(F.array_intersect(
            F.array_distinct(X.tokenize("text")),
            F.array(*[F.lit(s) for s in _STOPWORDS]))).alias("stop_hits"),
    )
    n_chars, n_words = F.col("n_chars"), F.col("n_words")
    stop_hits = F.col("stop_hits")
    mean_word_len = F.col("n_nonws").cast("double") / F.greatest(
        n_words, F.lit(1))
    return m.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round((n_chars - F.col("n_alnum_ws")).cast("double")
                / F.greatest(n_chars, F.lit(1)), 6).alias("symbol_ratio"),
        stop_hits.cast("long").alias("stopword_hits"),
        ((n_words >= _GOPHER_MIN_WORDS)
         & mean_word_len.between(_GOPHER_WORD_LEN_LO, _GOPHER_WORD_LEN_HI)
         & (stop_hits >= 1)).alias("passes"),
    )


# --- capped inverted-index postings ---------------------------------------
_POSTINGS_CAP = 20
_MIN_DF = 5


@register(
    "inverted_index_postings",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(list_distinct({_TOKENS_SQL})) AS token
            FROM documents
        )
        SELECT token,
               CAST(count(*) AS BIGINT) AS df,
               coalesce(array_to_string(
                   (list_sort(list(doc_id)))[1:{_POSTINGS_CAP}], '|'), '')
                   AS postings
        FROM tok
        GROUP BY token
        HAVING count(*) >= {_MIN_DF}
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token → (document frequency, first {cap} doc_ids). The cap is
    applied with a row_number window BEFORE any collect_list, so per-
    token state is bounded even for tokens present in every document —
    the collect-then-slice shape would buffer the full postings list for
    "the"-class tokens and OOM at corpus scale.

    Token frequency is ZIPFIAN — the textbook skewed key — so the two
    per-token computations take the two skew-safe shapes: df is a
    ``groupBy`` count (partial aggregation collapses "the" to one row
    per map partition; an earlier ``count OVER (PARTITION BY token)``
    buffered the full hot partition in one task, and its presence in
    the window set also blocked the rank pushdown below), and the cap
    is a PURE row_number window whose ``rn <= cap`` filter Spark
    rewrites to a WindowGroupLimit — a map-side per-key top-k, so at
    most cap rows per token per map partition ever ship into the
    window shuffle (plan-locked in test_plan_shapes.py). The final
    equi-join marries two 1-row-per-token frames. The postings list is
    emitted as a '|'-joined STRING (doc_ids render identically as
    integers in both engines) because the driver's canonicalizer
    cannot hash top-level ARRAY cells (round-3 error); local tests
    split the string to keep element-wise assertions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(X.tokenize("text"))).alias("token"))
    dfs = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= _MIN_DF)
    )
    w_ord = Window.partitionBy("token").orderBy("doc_id")
    capped = toks.withColumn("rn", F.row_number().over(w_ord)).where(
        F.col("rn") <= _POSTINGS_CAP
    )
    # join the df table BEFORE the postings aggregate (both sides are
    # already token-partitioned — no extra exchange): the sub-_MIN_DF
    # Zipf tail, the majority of distinct tokens, drops here instead
    # of paying collect_list/sort/join-string work the final join
    # would discard (review-found)
    return (
        capped.join(dfs, "token")
        .groupBy("token")
        .agg(
            F.first("df").alias("df"),
            F.array_join(
                F.sort_array(F.collect_list("doc_id")).cast("array<string>"),
                "|",
            ).alias("postings"),
        )
        .select("token", "df", "postings")
    )


# --- compression-ratio quality signal (rows-only: needs zlib) -------------
_RATIO_SCHEMA = "doc_id long, n_bytes long, compression_ratio double"


def compression_ratio_batches(batches):
    """mapInPandas kernel: zlib level fixed at 6 for determinism."""
    import zlib

    import pandas as pd

    for pdf in batches:
        raw = pdf["text"].fillna("").str.encode("utf-8")
        comp = raw.map(lambda b: len(zlib.compress(b, 6)))
        n = raw.map(len)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": n.astype("int64"),
            "compression_ratio":
                (comp / n.clip(lower=1)).round(6).astype("float64"),
        })


@register(
    "txt_compression_ratio",
    **_PINS_KW("txt_compression_ratio"),
)
def txt_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib-compressed-size / raw-size per document — the classic
    boilerplate/repetition detector (highly repetitive text compresses
    far below ~0.4). zlib isn't expressible in either engine's SQL, so
    the oracle is a VALUES pin at the driver's sf0.01 derived
    INDEPENDENTLY (python zlib straight over the parquet —
    tools/pin_oracles.py), verifying the Arrow mapInPandas path
    end-to-end; exact values are also unit-tested."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(compression_ratio_batches, _RATIO_SCHEMA)


# --- tf-idf top terms per document ----------------------------------------
_TFIDF_TOP = 5
_TFIDF_MIN_DF = 2


@register(
    "txt_tfidf_top_terms",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM tok GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6)
                       AS tfidf
            FROM tf JOIN df USING (term) CROSS JOIN n
            WHERE df.df >= {_TFIDF_MIN_DF}
        )
        SELECT doc_id, term, tfidf FROM (
            SELECT doc_id, term, tfidf,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, term) AS rn
            FROM scored
        ) WHERE rn <= {_TFIDF_TOP}
    """,
)
def txt_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} most characteristic terms per document by tf·idf
    (idf = ln(N/df), df floor drops hapax noise). Shape at scale: the
    token explode feeds ONE shuffle keyed on (doc, term) for tf; the
    vocabulary-sized df aggregate broadcasts back onto it (term df is
    vocab-cardinality — MBs, not corpus-sized); N is a scalar. The
    final per-doc top-k is a window on the already-aggregated tf rows.
    Ties broken on term so both engines rank identically."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(X.tokenize("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        tok.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df") >= _TFIDF_MIN_DF)
    )
    n_docs = docs.count()
    scored = (
        tf.join(F.broadcast(df_), "term")
        .select(
            "doc_id", "term",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TFIDF_TOP)
        .select("doc_id", "term", "tfidf")
    )


# --- text normalization ----------------------------------------------------
_ACCENT_FROM = "áàâäãåéèêëíìîïóòôöõúùûüýÿçñ"
_ACCENT_TO = "aaaaaaeeeeiiiiooooouuuuyycn"
_CTRL_PAT = r"[\x00-\x1f\x7f]"
# exercises every normalization step on every row (the corpus itself
# is clean ASCII): accents, uppercase accents, a control char, runs of
# whitespace
_NORM_SEED = " \tÀ  l'Étude  déjà\x01vu  "


@register(
    "txt_normalize",
    oracle=f"""
        WITH seeded AS (
            SELECT doc_id, text || '{_NORM_SEED.replace("'", "''")}' AS raw
            FROM documents
        )
        SELECT doc_id,
               md5(translate(
                     trim(regexp_replace(
                          regexp_replace(lower(raw), '{_CTRL_PAT}', ' ', 'g'),
                          '\\s+', ' ', 'g')),
                     '{_ACCENT_FROM}', '{_ACCENT_TO}')) AS norm_fp,
               CAST(length(translate(
                     trim(regexp_replace(
                          regexp_replace(lower(raw), '{_CTRL_PAT}', ' ', 'g'),
                          '\\s+', ' ', 'g')),
                     '{_ACCENT_FROM}', '{_ACCENT_TO}')) AS BIGINT) AS norm_len
        FROM seeded
    """,
)
def txt_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic text normalization as pure expressions: lowercase,
    control chars → space, whitespace collapse+trim, explicit
    accent-fold via translate (an enumerated Latin map — identical
    1:1 semantics in both engines, unlike locale-dependent collation
    tricks). A seeded suffix with accents/controls/whitespace runs
    makes the oracle exercise every step on every row of the otherwise
    ASCII corpus. Zero shuffle. The full-Unicode variant
    (txt_normalize_nfkc) needs Python's unicodedata and is rows-only."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat("text", F.lit(_NORM_SEED))
    norm = F.translate(
        F.trim(F.regexp_replace(
            F.regexp_replace(F.lower(raw), _CTRL_PAT, " "), r"\s+", " ")),
        _ACCENT_FROM, _ACCENT_TO)
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_fp"),
        F.length(norm).cast("long").alias("norm_len"),
    )


_NFKC_SCHEMA = "doc_id long, norm_fp string, norm_len long"


def nfkc_normalize_batches(batches):
    """mapInPandas kernel: full-Unicode NFKC + accent strip (NFD,
    drop combining marks) + control strip + whitespace collapse."""
    import hashlib
    import re
    import unicodedata

    import pandas as pd

    ctrl = re.compile(r"[\x00-\x1f\x7f]")
    ws = re.compile(r"\s+")

    def _norm(s):
        s = unicodedata.normalize("NFKC", s or "")
        s = "".join(c for c in unicodedata.normalize("NFD", s)
                    if unicodedata.category(c) != "Mn")
        s = ws.sub(" ", ctrl.sub(" ", s.lower())).strip()
        return s

    for pdf in batches:
        normed = pdf["text"].map(_norm)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "norm_fp": normed.map(
                lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()),
            "norm_len": normed.map(len).astype("int64"),
        })


# Unicode decoration SEEDED onto every document (url_normalize_dedup
# pattern: the oracle constructs the expected output independently, so
# it can't share the normalizer's bugs): fullwidth letters, a combining
# accent, NBSP, the № compatibility sign, roman numeral Ⅻ and a tab —
# folding to the constant below, verified against CPython unicodedata.
_NFKC_SEED = "Ｃａｆé №42 —\tＸⅫ: "
_NFKC_SEED_FOLDED = "cafe no42 — xxii: "


@register(
    "txt_normalize_nfkc",
    oracle=rf"""
        WITH n AS (
            SELECT doc_id,
                   rtrim('{_NFKC_SEED_FOLDED}' ||
                         trim(regexp_replace(regexp_replace(lower(text),
                              '[\x00-\x1f\x7f]', ' ', 'g'),
                              '\s+', ' ', 'g'))) AS s
            FROM documents
        )
        SELECT doc_id, md5(s) AS norm_fp,
               CAST(length(s) AS BIGINT) AS norm_len
        FROM n
    """,
)
def txt_normalize_nfkc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-Unicode normalization (NFKC fold, combining-mark strip) —
    the curation-grade version of txt_normalize for corpora that are
    not Latin-1. Needs unicodedata (Arrow mapInPandas), but it's still
    VALUE-oracled: the testdata text is ASCII (where the fold is
    identity and DuckDB can mirror lower/ctrl/whitespace exactly), so
    each page is PREFIXED in-plan with a crafted Unicode seed whose
    folded form is a known constant — the oracle concatenates that
    constant with its own ASCII normalization and compares md5 +
    length, making the NFKC/NFD path itself drive the hash."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit(_NFKC_SEED), F.col("text")).alias("text"),
    )
    return docs.mapInPandas(nfkc_normalize_batches, _NFKC_SCHEMA)


# --- URL canonicalization (crawler-core dedup upgrade) --------------------
@register(
    "url_normalize_dedup",
    oracle="""
        SELECT doc_id,
               'http://src' || CAST(doc_id % 20 AS VARCHAR) || '.example.com'
                   || '/Doc/' || CAST(doc_id AS VARCHAR)
                   || CASE WHEN doc_id % 4 = 2
                           THEN '?q=' || CAST(doc_id AS VARCHAR) ELSE '' END
                   AS canonical_url
        FROM documents
    """,
)
def url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """functions/url.normalize_url under a value oracle: messy URL
    variants (uppercase scheme/host, default port + fragment, trailing
    slash, tracking params) are SEEDED per row, normalized by the
    expression chain, and compared against the expected canonical form
    CONSTRUCTED independently in SQL — the oracle never sees the
    normalizer's regexes, so it can't share their bugs. The variants
    cover each rule; dedup consequence (variants collapse) is
    unit-tested in tests/test_url.py."""
    from crawler_spark.functions.url import normalize_url

    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    host = F.concat(F.lit("HTTP://Src"), (F.col("doc_id") % 20).cast("string"),
                    F.lit(".Example.COM"))
    v = F.col("doc_id") % 4
    messy = F.concat(
        host,
        F.when(v == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/Doc/"), did,
        F.when(v == 0, F.lit("#top"))
         .when(v == 1, F.lit("/"))
         .when(v == 2, F.concat(F.lit("?utm_source=mail&q="), did))
         .otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id", normalize_url(messy).alias("canonical_url"))


# --- content-defined chunking (rolling-hash boundaries) -------------------
_CDC_MOD = 8  # expected chunk length in tokens (boundary prob 1/mod)


@register(
    "doc_chunks_cdc",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS_SQL} AS ts FROM documents
        ),
        flagged AS (
            SELECT doc_id, ts,
                   list_filter(
                       generate_series(2, len(ts)),
                       p -> ('0x' || substr(md5(ts[p-1] || ' ' || ts[p]),
                                            1, 8))::BIGINT % {_CDC_MOD} = 0
                   ) AS bpos
            FROM toks WHERE len(ts) >= 1
        ),
        bounds AS (
            SELECT doc_id, ts,
                   list_prepend(1, bpos) AS starts,
                   list_append(bpos, len(ts) + 1) AS ends
            FROM flagged
        )
        SELECT doc_id, CAST(u.i - 1 AS INT) AS chunk_idx,
               array_to_string(ts[starts[u.i] : ends[u.i] - 1], ' ')
                   AS chunk_text,
               CAST(ends[u.i] - starts[u.i] AS INT) AS n_tokens
        FROM bounds, unnest(generate_series(1, len(starts))) AS u(i)
    """,
)
def doc_chunks_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking: a boundary falls BEFORE token ``p``
    whenever the rolling hash of the (token[p-1], token[p]) window is
    ≡ 0 (mod 8) — the LBFS/rsync trick (Muthitacharoen et al.
    SOSP'01). Unlike the fixed-window ``doc_chunks``, an insertion or
    deletion only perturbs the chunks whose window it touches: the
    hash re-synchronizes at the next unchanged boundary, so chunk
    fingerprints downstream (dedup, delta-sync, recrawl diffing) stay
    stable under edits instead of shifting corpus-wide. Production
    CDC adds min/max chunk bounds on top of the pure hash rule;
    omitted here so the oracle stays a one-to-one transcription.

    Scale shape: ZERO shuffle — boundaries, chunk starts/ends and the
    chunks themselves are all array HOFs evaluated per row, then one
    posexplode. The token array crosses a Generate barrier
    (explode(array(...))) first, so the chunk-slicing lambda indexes
    a MATERIALIZED attribute — without it CollapseProject inlines the
    tokenizer into the lambda and re-parses the document per chunk
    (the O(n²) trap fixed in the shingle family; this query measured
    6.8 s → re-check in BENCH_FULL after the barrier). Same growth
    story as ``doc_chunks``: output rows ≈ n_tokens/8 per doc,
    handled by input-split sizing, not a repartition."""
    docs = load_table(spark, sf_dir, "documents")
    # tokenize once in the projection, filter on the bound attribute
    # after — the where-before-select form evaluated the tokenizer a
    # second time for the size guard
    tokd = docs.select(
        "doc_id", F.explode(F.array(X.tokenize("text"))).alias("ts")
    ).where(F.size("ts") >= 1)
    toks = F.col("ts")
    n = F.size(toks)
    # boundary flag for positions 2..n (1-indexed), via shifted slices
    flags = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.pmod(
            F.conv(F.substring(F.md5(F.concat_ws(" ", a, b)), 1, 8), 16, 10)
            .cast("long"),
            F.lit(_CDC_MOD),
        ) == 0,
    )
    bpos = F.when(n >= 2, F.filter(
        F.zip_with(
            F.sequence(F.lit(2), n), flags,
            lambda p, f: F.struct(p.alias("p"), f.alias("f")),
        ),
        lambda s: s["f"],
    )).otherwise(F.array().cast("array<struct<p:int,f:boolean>>"))
    starts = F.concat(
        F.array(F.lit(1)),
        F.transform(bpos, lambda s: s["p"]),
    )
    ends = F.concat(
        F.slice(starts, 2, F.size(starts) - 1), F.array(n + 1))
    chunks = F.zip_with(
        starts, ends, lambda s, e: F.slice(toks, s, e - s))
    return (
        tokd
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "ctoks"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.concat_ws(" ", "ctoks").alias("chunk_text"),
            F.size("ctoks").alias("n_tokens"),
        )
    )
