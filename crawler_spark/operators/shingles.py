"""Arrow-kernel shingle projection (guide §4.2): the tokenize →
k-word-shingle → distinct pipeline as ONE ``mapInArrow`` kernel.

Why this exists: the expression form —
``explode(array_distinct(word_shingles(text, k)))`` — is built from
interpreted higher-order functions (``zip_with``/``transform`` are
CodegenFallback) whose fold evaluates the regex tokenizer ~2k times
per row. Round-12 profiling put that projection at 1-4 s of every
query in the ngram/containment family. The whole sf0.1 projection is
~0.13 s of single-threaded Python (measured round 13), so handing
whole Arrow batches to the C regex engine beats the JVM expression
chain by an order of magnitude even after paying the Python boundary
once (guide §4.2: let Spark distribute, let native code compute).

Parity contract (bit-identical output to the expression form, proven
in tests/test_shingles.py):

* ``lower()`` stays in the JVM — the kernel receives pre-lowered
  text, so locale/Unicode case semantics are exactly the expression
  form's (and the DuckDB oracle's).
* Tokenization is ``re.compile(r"\\w+", re.ASCII)`` — Java's default
  ``\\w`` is the ASCII class ``[a-zA-Z0-9_]``; Python's ``re.ASCII``
  flag selects the identical class (without it Python's Unicode
  ``\\w`` would tokenize non-ASCII text differently).
* ``xxhash64``/any downstream hashing stays in the JVM, so hash
  values can never drift from the oracle-verified ones.
* Per-document shingles are emitted SORTED: consumers are
  order-insensitive (groupBy/distinct), and sorting makes the kernel
  deterministic regardless of worker PYTHONHASHSEED (set iteration
  order is not stable across processes).

Scale shape: a per-partition projection — no shuffle, no driver
state; only (id, lowered text) crosses the boundary (guide §4:
project before an opaque function, because Spark cannot prune columns
through it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def shingle_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    keep_empty: bool = False,
) -> DataFrame:
    """(id_col, s): one row per DISTINCT k-word shingle per document —
    the kernel twin of
    ``explode(array_distinct(word_shingles(text_col, k)))``.

    ``keep_empty=True`` mirrors ``explode_outer``: a document with
    fewer than k tokens contributes one (id, NULL) row instead of
    vanishing (decontaminate's zero-shingle contract).
    """
    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [T.StructField(id_col, id_field.dataType, id_field.nullable),
         T.StructField("s", T.StringType(), True)]
    )

    def kernel(batches):
        import re

        import pyarrow as pa

        pat = re.compile(r"\w+", re.ASCII)
        join = " ".join
        for b in batches:
            ids = b.column(0).to_pylist()
            texts = b.column(1).to_pylist()
            out_ids: list = []
            out_s: list = []
            for i, t in zip(ids, texts):
                toks = pat.findall(t) if t else []
                m = len(toks) - (k - 1)
                if m > 0:
                    sh = sorted({join(toks[j:j + k]) for j in range(m)})
                    out_ids.extend([i] * len(sh))
                    out_s.extend(sh)
                elif keep_empty:
                    out_ids.append(i)
                    out_s.append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, type=b.column(0).type),
                 pa.array(out_s, type=pa.string())],
                names=[id_col, "s"],
            )

    return (
        df.select(F.col(id_col), F.lower(F.col(text_col)).alias("__lt"))
        .mapInArrow(kernel, schema=out_schema)
    )


def shingle_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    out_id: str | None = None,
) -> DataFrame:
    """(out_id or id_col, g): xxhash64 of each distinct k-shingle —
    the kernel twin of the grams frames in ngram_jaccard_pairs /
    dedup_incremental. Hashing is the JVM expression, so values are
    identical to the expression form by construction."""
    out = out_id or id_col
    rows = shingle_rows(df, text_col=text_col, id_col=id_col, k=k)
    return rows.select(
        F.col(id_col).alias(out), F.xxhash64("s").alias("g")
    )
