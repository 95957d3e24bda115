"""Search-API facade tests (SURVEY.md §2.13): extraction schemas,
RAG chat assembly + flag gating, web_pages pagination with FTS."""

from __future__ import annotations

import json

import pytest


class TestExtraction:
    def test_stub_extractor_deterministic_and_schema_conformant(self):
        from crawler_spark.functions.extraction import (
            EXTRACTION_SCHEMAS,
            StubExtractor,
            extraction_prompt,
        )

        ext = StubExtractor()
        a = json.loads(ext.extract("ecommerce", "some product page text"))
        b = json.loads(ext.extract("ecommerce", "some product page text"))
        assert a == b
        assert set(a) == {f.name for f in EXTRACTION_SCHEMAS["ecommerce"].fields}
        assert a["currency"] == "USD" and isinstance(a["price"], float)
        blog = json.loads(ext.extract("blog", "a blog post body"))
        assert set(blog) == {f.name for f in EXTRACTION_SCHEMAS["blog"].fields}
        # unknown schema and None content degrade to {}
        assert ext.extract("nope", "x") == "{}"
        assert ext.extract("ecommerce", None) == "{}"
        assert "product_name" in extraction_prompt("ecommerce", "abc")

    def test_malformed_json_degrades_to_null_struct(self, spark):
        from crawler_spark.functions.extraction import parse_structured

        df = spark.createDataFrame(
            [("ok", '{"product_name":"x","price":1.5}'), ("bad", "{not json")],
            "id string, raw string",
        )
        rows = {r.id: r for r in df.select(
            "id", parse_structured("raw", "ecommerce").alias("sd")).collect()}
        assert rows["ok"].sd.product_name == "x"
        assert rows["ok"].sd.price == 1.5
        assert rows["bad"].sd is None or all(
            v is None for v in rows["bad"].sd.asDict().values()
        )


class TestRagChat:
    def test_chat_assembles_context_and_answer(self, spark):
        from crawler_spark.plans.search_api import rag_chat

        row = rag_chat(spark, "/root/testdata/sf0.001", "fast hash join").collect()[0]
        assert row.question == "fast hash join"
        assert row.context.count("URL: ") == 5  # k=5 context blocks
        assert "Question: fast hash join" in row.prompt
        assert row.answer.startswith("stub-answer-")
        # deterministic
        row2 = rag_chat(spark, "/root/testdata/sf0.001", "fast hash join").collect()[0]
        assert row2.answer == row.answer

    def test_chat_flag_gated(self, spark):
        from crawler_spark.plans.jobs import default_flags
        from crawler_spark.plans.search_api import rag_chat
        from pyspark.sql import functions as F

        flags = default_flags(spark).withColumn(
            "is_enabled",
            F.when(F.col("name") == "chat_ui", F.lit(False)).otherwise(F.col("is_enabled")),
        )
        out = rag_chat(spark, "/root/testdata/sf0.001", "q", flags=flags)
        assert out.count() == 0
        assert out.columns == ["question", "context", "prompt", "answer"]


class TestFtsStemming:
    def test_stemmed_match_joining_matches_join(self, spark):
        """SURVEY §7 decision 2: english stemming behind a flag, off by
        default (oracle parity). Stemmed mode must match across
        inflections BOTH ways; unstemmed mode must not."""
        from crawler_spark.functions.text import ts_match

        df = spark.createDataFrame(
            [(1, "how to join two tables"),
             (2, "joining tables quickly"),
             (3, "merged and sorted runs"),
             (4, "completely unrelated text")],
            "id long, body string",
        )

        def hits(query, stem):
            return {r.id for r in
                    df.filter(ts_match("body", query, stem=stem)).collect()}

        assert hits("joining", stem=False) == {2}
        assert hits("joining", stem=True) == {1, 2}
        assert hits("join", stem=True) == {1, 2}
        assert hits("merges", stem=True) == {3}   # merges→merg, merged→merg
        assert hits("tables joined", stem=True) == {1, 2}
        assert hits("unrelated joins", stem=True) == set()  # AND semantics

    def test_default_unstemmed_unchanged(self, spark):
        """The default path must stay byte-identical to the oracle's
        token logic — stemming is strictly opt-in."""
        from crawler_spark.functions.text import ts_match

        df = spark.createDataFrame([(1, "fast hash join")], "id long, body string")
        assert df.filter(ts_match("body", "hash join")).count() == 1
        assert df.filter(ts_match("body", "hashes")).count() == 0


class TestTsqueryGrammar:
    """tsquery operator subset (reference search.py:63 passes raw
    tsquery strings to to_tsquery): & | ! parens and prefix :* with
    Postgres precedence ! > & > |."""

    def _hits(self, spark, query, stem=False):
        from crawler_spark.functions.text import ts_match_query

        df = spark.createDataFrame(
            [(1, "fast hash join on tables"),
             (2, "merge sort of sorted runs"),
             (3, "window functions and windowing"),
             (4, "hash join with vector probe"),
             (5, "completely unrelated text")],
            "id long, body string",
        )
        return {r.id for r in
                df.filter(ts_match_query("body", query, stem=stem)).collect()}

    def test_and_or_not_parens(self, spark):
        assert self._hits(spark, "hash & join") == {1, 4}
        assert self._hits(spark, "hash & join & !vector") == {1}
        assert self._hits(spark, "merge | windowing") == {2, 3}
        assert self._hits(spark, "(merge | hash) & !vector") == {1, 2}
        # precedence: ! binds tighter than &, & tighter than |
        assert self._hits(spark, "hash & !vector | merge") == {1, 2}

    def test_prefix_star(self, spark):
        assert self._hits(spark, "wind:*") == {3}
        assert self._hits(spark, "sort:*") == {2}       # sort + sorted
        assert self._hits(spark, "hash & tabl:*") == {1}
        # prefix stays verbatim under stem=True but is matched against
        # STEMMED doc tokens ("windowing"→"window"), so a short prefix
        # still hits while an inflected full-word prefix does not
        assert self._hits(spark, "wind:*", stem=True) == {3}
        assert self._hits(spark, "windowing:*", stem=True) == set()

    def test_stemmed_terms(self, spark):
        assert self._hits(spark, "sorted & merges", stem=True) == {2}

    def test_empty_query_matches_all(self, spark):
        assert self._hits(spark, "") == {1, 2, 3, 4, 5}

    def test_syntax_errors_raise(self):
        import pytest as _pytest

        from crawler_spark.functions.text import _tsquery_parse

        for bad in ["hash join", "& hash", "hash &", "(hash", "hash)",
                    "hash ! join", "hash & | join"]:
            with _pytest.raises(ValueError):
                _tsquery_parse(bad)

    def test_parse_shapes(self):
        from crawler_spark.functions.text import _tsquery_parse

        assert _tsquery_parse("a & b | c") == (
            "or", ("and", ("term", "a"), ("term", "b")), ("term", "c"))
        assert _tsquery_parse("a & !b:*") == (
            "and", ("term", "a"), ("not", ("prefix", "b")))
        assert _tsquery_parse("!(a | b)") == (
            "not", ("or", ("term", "a"), ("term", "b")))


class TestTsqueryPhrase:
    """Phrase operators <-> and <N> (Postgres FOLLOWED BY): b's match
    position exactly N tokens after a's; <-> ≡ <1>. Precedence sits
    between & and ! (| loosest, then &, then <->, then !)."""

    def _hits(self, spark, query, stem=False):
        from crawler_spark.functions.text import ts_match_query

        df = spark.createDataFrame(
            [(1, "fast hash join on tables"),
             (2, "hash of the join column"),          # hash..join dist 3
             (3, "join hash"),                         # reversed order
             (4, "filtered hash probe"),
             (5, "merge the big runs"),                # merge <2> big
             (6, "merge big runs"),                    # merge <1> big
             (7, "hash")],                             # phrase at array end
            "id long, body string",
        )
        return {r.id for r in
                df.filter(ts_match_query("body", query, stem=stem)).collect()}

    def test_adjacent_and_distance(self, spark):
        assert self._hits(spark, "hash <-> join") == {1}
        assert self._hits(spark, "hash <3> join") == {2}
        assert self._hits(spark, "merge <2> big") == {5}
        assert self._hits(spark, "merge <-> big") == {6}
        # order matters, unlike &
        assert self._hits(spark, "join <-> hash") == {3}
        assert self._hits(spark, "hash & join") == {1, 2, 3}

    def test_prefix_in_phrase_and_or(self, spark):
        assert self._hits(spark, "filt:* <-> hash") == {4}
        assert self._hits(spark, "(merge | hash) <-> big") == {6}
        assert self._hits(spark, "hash <-> join | merge <2> big") == {1, 5}
        # OR of different "widths" inside a phrase is fine with anchor
        # semantics: (join | big <2> runs) <-> X anchors at join/runs
        assert self._hits(spark, "hash <-> (join | of)") == {1, 2}

    def test_nested_phrase_chains_left(self, spark):
        # a <-> b <-> c parses left-assoc: ((a<->b)<->c) — trigram
        assert self._hits(spark, "fast <-> hash <-> join") == {1}
        assert self._hits(spark, "fast <-> join <-> hash") == set()

    def test_no_out_of_bounds_match(self, spark):
        # "hash" is the LAST token of docs 2-as-suffix/7 — the i+N
        # lookup past the end must be False, not null/error
        assert self._hits(spark, "hash <-> anything") == set()

    def test_phrase_parse_shape_and_precedence(self):
        from crawler_spark.functions.text import _tsquery_parse

        assert _tsquery_parse("a <-> b") == (
            "phrase", 1, ("term", "a"), ("term", "b"))
        assert _tsquery_parse("a <2> b:*") == (
            "phrase", 2, ("term", "a"), ("prefix", "b"))
        # <-> binds tighter than &, looser than !
        assert _tsquery_parse("a & b <-> c") == (
            "and", ("term", "a"),
            ("phrase", 1, ("term", "b"), ("term", "c")))
        assert _tsquery_parse("a <-> b <-> c") == (
            "phrase", 1, ("phrase", 1, ("term", "a"), ("term", "b")),
            ("term", "c"))

    def test_unsupported_inside_phrase_raises(self, spark):
        import pytest as _pytest

        from crawler_spark.functions.text import ts_match_query

        for bad in ["(a & b) <-> c", "(!a) <-> b"]:
            with _pytest.raises(ValueError):
                ts_match_query("body", bad)
        for bad_syntax in ["<-> a", "a <->", "a <x> b"]:
            with _pytest.raises(ValueError):
                ts_match_query("body", bad_syntax)

    def test_stemmed_phrase(self, spark):
        # stem=True stems doc tokens AND plain phrase terms in lockstep
        assert self._hits(spark, "merged <-> big", stem=True) == {6}


class TestWebPages:
    def test_fts_pagination(self, spark):
        from crawler_spark.plans.search_api import web_pages

        page = web_pages(
            spark, "/root/testdata/sf0.001", limit=5, offset=0,
            sort_by="n_chars", sort_order="desc", query="fast hash join",
        ).collect()
        assert 0 < len(page) <= 5
        sizes = [r.n_chars for r in page]
        assert sizes == sorted(sizes, reverse=True)


class TestMMRRerank:
    """mmr_rerank (operators/similarity.py) vs a pure-python reference:
    the greedy trade of relevance against redundancy must pick the
    diverse doc over a near-duplicate of an already-selected one."""

    @staticmethod
    def _ref_mmr(ids, vecs, q, k, lam):
        import numpy as np

        vecs = np.asarray(vecs, float)
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = np.asarray(q, float)
        qn = qn / np.linalg.norm(qn)
        rel = vecs @ qn
        sim = vecs @ vecs.T
        chosen = []
        while len(chosen) < k and len(chosen) < len(ids):
            best, best_s = None, -1e18
            for i in range(len(ids)):
                if i in chosen:
                    continue
                div = max((sim[i][j] for j in chosen), default=0.0)
                s = lam * rel[i] - (1 - lam) * div
                if s > best_s + 1e-12:
                    best, best_s = i, s
            chosen.append(best)
        return [ids[i] for i in chosen]

    def _toy(self, spark):
        # q along e0. Doc 1 most relevant but OFF the query axis (if
        # pick 1 were parallel to q, rel == sim(., pick1) for everyone
        # and MMR degenerates to a pure rescale of relevance); doc 2 a
        # near-duplicate of doc 1; doc 3 less relevant but on the far
        # side of q (low sim to doc 1); doc 4 low-relevance filler.
        rows = [
            (1, [0.95, 0.3122, 0.0, 0.0]),
            (2, [0.94, 0.33, 0.05, 0.0]),
            (3, [0.85, -0.5, 0.17, 0.0]),
            (4, [0.2, 0.1, 0.0, 0.97]),
        ]
        return rows, spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_matches_python_reference(self, spark):
        from crawler_spark.operators.similarity import mmr_rerank

        rows, df = self._toy(spark)
        q = [1.0, 0.0, 0.0, 0.0]
        got = [
            r.vec_id
            for r in mmr_rerank(df, q, k=3, fetch_k=4, lam=0.7)
            .orderBy("rank").collect()
        ]
        want = self._ref_mmr(
            [r[0] for r in rows], [r[1] for r in rows], q, k=3, lam=0.7
        )
        assert got == want
        # and the diversity property itself: the near-dup of pick 1 is
        # NOT pick 2 — the orthogonal doc 3 outranks it
        assert got[0] == 1 and got[1] == 3

    def test_lambda_one_is_pure_relevance(self, spark):
        from crawler_spark.operators.similarity import (
            knn_topk, mmr_rerank,
        )

        rows, df = self._toy(spark)
        q = [1.0, 0.0, 0.0, 0.0]
        got = [
            r.vec_id
            for r in mmr_rerank(df, q, k=4, fetch_k=4, lam=1.0)
            .orderBy("rank").collect()
        ]
        pure = [
            r.vec_id for r in knn_topk(df, q, k=4, id_cols=("vec_id",)).collect()
        ]
        assert got == pure

    def test_registered_query_deterministic(self, spark):
        from crawler_spark.plans.registry import QUERIES, load_all

        load_all()
        a = QUERIES["search_mmr_rerank"](spark, "/root/testdata/sf0.001").collect()
        b = QUERIES["search_mmr_rerank"](spark, "/root/testdata/sf0.001").collect()
        assert a == b and len(a) == 10
        assert [r.rank for r in a] == list(range(1, 11))
