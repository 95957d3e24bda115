"""Tests for train/eval decontamination (operators/decontam.py):
planted-overlap detection, zero-shingle documents surviving the pass,
and the broadcast-join plan shape that makes it 100 TB-safe."""

from __future__ import annotations

import contextlib
import io


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _result(spark, train_rows, eval_rows, k=3):
    from crawler_spark.operators.decontam import decontaminate

    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    out = decontaminate(train, ev, shingle_k=k)
    return {r.doc_id: r for r in out.collect()}


class TestDecontaminate:
    def test_planted_overlap_flagged(self, spark):
        got = _result(
            spark,
            train_rows=[
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely unrelated sentence about spark plans"),
            ],
            eval_rows=[(100, "a story where the quick brown fox appears")],
        )
        # doc 1 shares "the quick brown" and "quick brown fox"
        assert got[1].contaminated and got[1].n_contaminated == 2
        assert not got[2].contaminated and got[2].n_contaminated == 0

    def test_short_doc_kept_with_zero_shingles(self, spark):
        got = _result(
            spark,
            train_rows=[(1, "two words"), (2, "three word doc")],
            eval_rows=[(100, "three word doc here")],
        )
        assert got[1].n_shingles == 0 and not got[1].contaminated
        assert got[2].n_shingles == 1 and got[2].contaminated

    def test_counts_are_distinct_shingles(self, spark):
        # repeated shingle in the train doc counts once (array_distinct)
        got = _result(
            spark,
            train_rows=[(1, "a b c a b c")],
            eval_rows=[(100, "x a b c y")],
        )
        # distinct shingles of doc 1: "a b c", "b c a", "c a b" = 3
        assert got[1].n_shingles == 3
        assert got[1].n_contaminated == 1  # only "a b c" is in eval

    def test_eval_side_broadcasts(self, spark):
        from crawler_spark.operators.decontam import decontaminate

        train = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
        ev = spark.createDataFrame([(2, "c d e f")], "doc_id long, text string")
        plan = plan_text(decontaminate(train, ev, shingle_k=3))
        assert "BroadcastHashJoin" in plan
