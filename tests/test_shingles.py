"""Parity lock for the Arrow shingle kernel (operators/shingles.py):
the kernel must emit EXACTLY the rows of the expression form
``explode(array_distinct(word_shingles(text, k)))`` — on the real
testdata and on an adversarial corpus (empty docs, sub-k docs,
punctuation runs, repeated shingles, NULLs, case folding, non-ASCII
separators). The round-13 optimization swapped the kernel into the
whole ngram/containment family; this test is what makes that swap a
pure plan change."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions import text as X
from crawler_spark.operators.shingles import shingle_hashes, shingle_rows

SF_SMALL = "/root/testdata/sf0.001"

ADVERSARIAL = [
    (1, "plain three word shingle test"),
    (2, ""),                       # empty
    (3, None),                     # NULL text
    (4, "two words"),              # fewer than k tokens
    (5, "exactly three tokens"),   # exactly k
    (6, "a b a b a b a b"),        # repeated shingles -> distinct
    (7, "...!!!   ???"),           # punctuation only -> zero tokens
    (8, "MiXeD CaSe TOKENS MiXeD CaSe tokens"),  # case folding
    (9, "tab\tand\nnewline  and   runs of spaces here"),
    (10, "digits 123 under_scores _lead and trail_ ok"),
    (11, "unicode café naïve résumé words"),
    (12, "hy-phen splits to-kens a-b c-d e-f"),
    (13, "a " * 200 + "b"),        # long repeated run
]


def _expr_rows(df, k, outer=False):
    explode = F.explode_outer if outer else F.explode
    return df.select(
        "doc_id",
        explode(F.array_distinct(X.word_shingles("text", k))).alias("s"),
    )


def _as_sorted(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def adversarial(spark):
    return spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")


@pytest.mark.parametrize("k", [2, 3, 5])
def test_kernel_matches_expression_adversarial(spark, adversarial, k):
    got = _as_sorted(shingle_rows(adversarial, k=k))
    want = _as_sorted(_expr_rows(adversarial, k))
    assert got == want


@pytest.mark.parametrize("k", [3, 13])
def test_kernel_matches_expression_testdata(spark, k):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text")
    got = _as_sorted(shingle_rows(docs, k=k))
    want = _as_sorted(_expr_rows(docs, k))
    assert got == want


def test_keep_empty_matches_explode_outer(spark, adversarial):
    got = _as_sorted(shingle_rows(adversarial, k=3, keep_empty=True))
    want = _as_sorted(_expr_rows(adversarial, 3, outer=True))
    assert got == want


def test_hashes_match_expression(spark, adversarial):
    got = _as_sorted(shingle_hashes(adversarial, k=3, out_id="id"))
    want = _as_sorted(
        adversarial.select(
            F.col("doc_id").alias("id"),
            F.explode(
                F.transform(
                    F.array_distinct(X.word_shingles("text", 3)),
                    lambda s: F.xxhash64(s),
                )
            ).alias("g"),
        )
    )
    assert got == want


def test_custom_id_and_text_cols(spark):
    df = spark.createDataFrame(
        [(7, "alpha beta gamma delta")], "k long, body string"
    )
    rows = shingle_rows(df, text_col="body", id_col="k", k=3)
    assert rows.columns == ["k", "s"]
    assert _as_sorted(rows) == [
        (7, "alpha beta gamma"), (7, "beta gamma delta")]
