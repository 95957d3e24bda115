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


class TestContaminatedSpans:
    """Exact-substring span detection (contaminated_spans): the
    L + stride - 1 alignment guarantee, the below-threshold negative,
    and the broadcast plan shape."""

    def _spans(self, spark, train_rows, eval_rows, span_len, stride):
        from crawler_spark.operators.decontam import contaminated_spans

        train = spark.createDataFrame(train_rows, "doc_id long, text string")
        ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
        out = contaminated_spans(
            train, ev, span_len=span_len, stride=stride)
        return sorted((r.doc_id, r.pos) for r in out.collect())

    def test_guaranteed_length_caught_at_every_alignment(self, spark):
        """A shared substring of length span_len + stride - 1 must be
        detected no matter where it sits in the train doc: shift the
        plant across a full stride period so every alignment class is
        exercised."""
        span_len, stride = 10, 4
        secret = "SECRETXYZSECR"  # 13 = span_len + stride - 1
        assert len(secret) == span_len + stride - 1
        eval_rows = [(100, f"benchmark asks about {secret} verbatim")]
        for shift in range(stride):
            filler = "z" * (5 + shift)
            got = self._spans(
                spark,
                [(1, f"{filler}{secret}{'y' * 7}")],
                eval_rows, span_len, stride,
            )
            assert got, f"plant missed at alignment shift {shift}"
            # every reported pos is a REAL span inside the plant
            start = len(filler) + 1
            assert all(
                start <= pos <= start + (len(secret) - span_len)
                for _, pos in got
            ), (shift, got)

    def test_below_window_never_matches(self, spark):
        # shared text shorter than span_len cannot produce a window match
        got = self._spans(
            spark,
            [(1, "aaaaaaa SHORT bbbbbbbbbbbb")],
            [(100, "eval set mentions SHORT too")],
            span_len=10, stride=2,
        )
        assert got == []

    def test_positions_are_scrubbed_offsets(self, spark):
        # pos is the 1-based char offset of the matching window
        span_len, stride = 6, 1
        got = self._spans(
            spark,
            [(1, "xxABCDEFxx")],
            [(100, "ABCDEF")],
            span_len, stride,
        )
        assert got == [(1, 3)]

    def test_eval_windows_broadcast(self, spark):
        from crawler_spark.operators.decontam import contaminated_spans

        train = spark.createDataFrame(
            [(1, "abcdefghijkl")], "doc_id long, text string")
        ev = spark.createDataFrame(
            [(2, "defghijklmno")], "doc_id long, text string")
        plan = plan_text(contaminated_spans(train, ev, span_len=6, stride=2))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
