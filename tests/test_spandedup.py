"""Cross-document duplicated-span detection/removal (operators/spans.py):
the sliding-gram tier must catch duplicates at ANY alignment (the case
block-aligned dedup_repeated_spans structurally misses), merge
overlapping hits into maximal spans, and on removal leave exactly one
surviving copy corpus-wide."""

from __future__ import annotations

import pytest

from crawler_spark.operators.spans import (
    crossdoc_duplicate_spans,
    positional_gram_hashes,
    remove_crossdoc_spans,
)

K = 4

UNIQUE_A = "alpha beta gamma delta epsilon zeta eta theta"
UNIQUE_B = "one two three four five six seven eight nine"
UNIQUE_C = "mercury venus earth mars jupiter saturn uranus neptune pluto"
SHARED = "lorem ipsum dolor sit amet consectetur"  # 6 tokens > K


@pytest.fixture(scope="module")
def docs(spark):
    # doc 1: shared run at the START; doc 2: same run mid-document at a
    # DIFFERENT (odd) offset so no fixed-block partition aligns them;
    # doc 3: all-unique control.
    return spark.createDataFrame(
        [
            (1, f"{SHARED} {UNIQUE_A}"),
            (2, f"{UNIQUE_B} {SHARED} extra trailing words here"),
            (3, UNIQUE_C),
        ],
        "doc_id long, text string",
    )


class TestSpanDetection:
    def test_shifted_duplicate_caught_with_maximal_span(self, spark, docs):
        spans = {
            r.doc_id: (r.span_start, r.span_end, r.span_tokens)
            for r in crossdoc_duplicate_spans(docs, k=K).collect()
        }
        # doc 1 holds the 6-token run at positions 0-5; doc 2 at 9-14
        # (after 9 UNIQUE_B tokens). Overlapping k-gram hits (starts
        # 0,1,2 / 9,10,11) must merge into ONE maximal span each.
        assert spans == {1: (0, 5, 6), 2: (9, 14, 6)}

    def test_unique_doc_reports_nothing(self, spark, docs):
        out = crossdoc_duplicate_spans(docs, k=K)
        assert out.where("doc_id = 3").count() == 0

    def test_keep_first_doc_suppresses_lowest_id(self, spark, docs):
        out = crossdoc_duplicate_spans(docs, k=K, keep_first_doc=True)
        assert [r.doc_id for r in out.collect()] == [2]

    def test_intra_doc_repeat_alone_is_not_cross_doc(self, spark):
        # one doc repeating its own phrase, nobody else sharing it:
        # ndocs >= 2 must not fire (that is dedup_repeated_spans' job).
        df = spark.createDataFrame(
            [(1, f"{SHARED} filler {SHARED}"), (2, UNIQUE_B)],
            "doc_id long, text string",
        )
        assert crossdoc_duplicate_spans(df, k=K).count() == 0

    def test_short_docs_emit_no_grams(self, spark):
        df = spark.createDataFrame(
            [(1, "too short"), (2, "too short")], "doc_id long, text string"
        )
        # sequence(0, n-k) would DESCEND for n < k without the guard —
        # the empty-array branch must hold, not emit pos -1 rows.
        assert positional_gram_hashes(df, k=K).count() == 0
        assert crossdoc_duplicate_spans(df, k=K).count() == 0

    def test_two_separated_shared_runs_stay_two_spans(self, spark):
        run2 = "red orange yellow green blue indigo"
        df = spark.createDataFrame(
            [
                (1, f"{SHARED} {UNIQUE_A} {run2}"),
                (2, f"{SHARED} {UNIQUE_B} {run2} tail"),
            ],
            "doc_id long, text string",
        )
        per_doc = (
            crossdoc_duplicate_spans(df, k=K)
            .groupBy("doc_id")
            .count()
            .collect()
        )
        assert {r.doc_id: r["count"] for r in per_doc} == {1: 2, 2: 2}


class TestSpanRemoval:
    def test_exactly_one_copy_survives(self, spark, docs):
        out = {r.doc_id: r for r in remove_crossdoc_spans(docs, k=K).collect()}
        # lowest-id holder (doc 1) keeps the shared run verbatim
        assert out[1].clean_text == f"{SHARED} {UNIQUE_A}".lower()
        assert out[1].n_removed == 0
        # doc 2 loses exactly the 6 shared tokens, seam stitched
        assert out[2].n_removed == 6
        assert (
            out[2].clean_text
            == f"{UNIQUE_B} extra trailing words here".lower()
        )
        # untouched doc passes through (canonical whitespace)
        assert out[3].n_removed == 0
        assert out[3].clean_text == UNIQUE_C.lower()

    def test_fully_duplicated_doc_empties(self, spark):
        df = spark.createDataFrame(
            [(1, f"{SHARED} {UNIQUE_A}"), (2, SHARED)],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in remove_crossdoc_spans(df, k=K).collect()}
        assert out[2].clean_text == ""
        assert out[2].n_removed == out[2].n_tokens == 6

    def test_token_accounting(self, spark, docs):
        for r in remove_crossdoc_spans(docs, k=K).collect():
            kept = len(r.clean_text.split()) if r.clean_text else 0
            assert kept + r.n_removed == r.n_tokens


class TestRandomizedAgainstBruteForce:
    """15 seeded random corpora with planted copied slices, all packed
    into ONE DataFrame (tokens salted per case so grams can't collide
    across cases) and cross-checked exactly against a brute-force
    positional-gram reference — the property pass for arbitrary
    alignments, nested copies, and repeat-within-copy edge cases that
    hand fixtures can't enumerate."""

    K = 4
    CASES = 15
    DOCS_PER_CASE = 4

    @staticmethod
    def _ref_spans(docs, k, keep_first=False):
        from collections import defaultdict

        where = defaultdict(set)
        for d, toks in docs.items():
            for i in range(len(toks) - k + 1):
                where[tuple(toks[i : i + k])].add(d)
        spans = {}
        for d, toks in docs.items():
            pos = [
                i
                for i in range(len(toks) - k + 1)
                if len(where[tuple(toks[i : i + k])]) >= 2
                and (
                    not keep_first
                    or d > min(where[tuple(toks[i : i + k])])
                )
            ]
            if not pos:
                continue
            out, s, e = [], pos[0], pos[0]
            for p in pos[1:]:
                if p - e <= k:
                    e = p
                else:
                    out.append((s, e + k - 1))
                    s = e = p
            out.append((s, e + k - 1))
            spans[d] = sorted(out)
        return spans

    def _corpora(self):
        import random

        rng = random.Random(20260814)
        corpora = {}
        for c in range(self.CASES):
            docs = {}
            for j in range(self.DOCS_PER_CASE):
                n = rng.randint(0, 40)
                docs[c * 100 + j] = [
                    f"c{c}w{rng.randint(0, 25)}" for _ in range(n)
                ]
            # plant 1-3 copied slices: a random run from one doc pasted
            # at a random offset of another (possibly overlapping case)
            for _ in range(rng.randint(1, 3)):
                src, dst = rng.sample(sorted(docs), 2)
                if len(docs[src]) < self.K:
                    continue
                ln = rng.randint(self.K, min(12, len(docs[src])))
                st = rng.randint(0, len(docs[src]) - ln)
                run = docs[src][st : st + ln]
                at = rng.randint(0, len(docs[dst]))
                docs[dst] = docs[dst][:at] + run + docs[dst][at:]
            corpora[c] = docs
        return corpora

    def _run(self, spark, keep_first):
        from pyspark.sql import functions as F

        corpora = self._corpora()
        rows = [
            (d, " ".join(toks))
            for docs in corpora.values()
            for d, toks in docs.items()
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {}
        for r in crossdoc_duplicate_spans(
            df, k=self.K, keep_first_doc=keep_first
        ).collect():
            got.setdefault(r.doc_id, []).append(
                (r.span_start, r.span_end)
            )
        got = {d: sorted(v) for d, v in got.items()}
        want = {}
        for docs in corpora.values():
            want.update(self._ref_spans(docs, self.K, keep_first))
        assert got == want

    def test_all_holders_mode_matches_reference(self, spark):
        self._run(spark, keep_first=False)

    def test_keep_first_mode_matches_reference(self, spark):
        self._run(spark, keep_first=True)

    def test_removal_matches_reference(self, spark):
        corpora = self._corpora()
        rows = [
            (d, " ".join(toks))
            for docs in corpora.values()
            for d, toks in docs.items()
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r for r in remove_crossdoc_spans(df, k=self.K).collect()
        }
        for docs in corpora.values():
            spans = self._ref_spans(docs, self.K, keep_first=True)
            for d, toks in docs.items():
                dropped = {
                    p
                    for (s, e) in spans.get(d, [])
                    for p in range(s, e + 1)
                }
                want = " ".join(
                    t for i, t in enumerate(toks) if i not in dropped
                )
                assert got[d].clean_text == want, d
                assert got[d].n_removed == len(dropped), d
