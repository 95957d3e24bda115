"""Invariant tests for the RAG-prep operators (plans/queries_ragprep.py)
beyond DuckDB value parity: chunk reconstruction/overlap, PII redaction
on crafted strings, inverted-index cap binding, and compression-ratio
discrimination between repetitive and high-entropy text."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

import __spark_entry__ as E
from crawler_spark.plans.queries_ragprep import (
    CHUNK_LEN,
    CHUNK_STRIDE,
    _MIN_DF,
    _POSTINGS_CAP,
)
from crawler_spark.sources import load_table

SF = "/root/testdata/sf0.001"

_QUERIES = E.queries()


class TestChunking:
    def test_chunks_reconstruct_documents(self, spark):
        docs = {r.doc_id: r.text
                for r in load_table(spark, SF, "documents").collect()
                if r.text}
        chunks = _QUERIES["doc_chunks"](spark, SF).collect()
        by_doc: dict[int, list] = {}
        for c in chunks:
            by_doc.setdefault(c.doc_id, []).append(c)
        assert set(by_doc) == set(docs)
        for doc_id, cs in by_doc.items():
            text = docs[doc_id]
            cs.sort(key=lambda c: c.chunk_id)
            # ids are 0..n-1, starts follow the stride exactly
            assert [c.chunk_id for c in cs] == list(range(len(cs)))
            assert [c.chunk_start for c in cs] == [
                1 + i * CHUNK_STRIDE for i in range(len(cs))]
            # every chunk is the literal substring; stride-prefixes
            # concatenate back to the full document (overlap = LEN-STRIDE)
            for c in cs:
                assert c.chunk_text == text[c.chunk_start - 1:
                                            c.chunk_start - 1 + CHUNK_LEN]
                assert c.chunk_len == len(c.chunk_text)
            rebuilt = "".join(c.chunk_text[:CHUNK_STRIDE] for c in cs[:-1])
            rebuilt += cs[-1].chunk_text
            assert rebuilt == text
            # overlap invariant only holds when the earlier chunk is
            # full-length (a 401..499-char doc has a short chunk 0)
            if len(cs) > 1 and cs[0].chunk_len == CHUNK_LEN:
                overlap = CHUNK_LEN - CHUNK_STRIDE
                assert cs[0].chunk_text[-overlap:] == \
                    cs[1].chunk_text[:overlap]


class TestPiiRedact:
    def test_seeded_pii_found_and_redacted(self, spark):
        rows = _QUERIES["txt_pii_redact"](spark, SF).collect()
        assert rows
        # every row got the deterministic seeded email + IP
        assert all(r.n_emails >= 1 for r in rows)
        assert all(r.n_ips >= 1 for r in rows)

    def test_redaction_exact_on_crafted_text(self, spark):
        from crawler_spark.plans.queries_ragprep import _EMAIL_PAT, _IP_PAT

        df = spark.createDataFrame(
            [("mail a.b+c@x-y.co and 1.2.3.4 but not 1.2.3 or a@b",)],
            "s string",
        ).select(
            F.regexp_replace(
                F.regexp_replace("s", _EMAIL_PAT, "<EMAIL>"),
                _IP_PAT, "<IP>").alias("red"),
            F.regexp_count("s", F.lit(_EMAIL_PAT)).alias("ne"),
            F.regexp_count("s", F.lit(_IP_PAT)).alias("ni"),
        )
        r = df.collect()[0]
        assert r.red == "mail <EMAIL> and <IP> but not 1.2.3 or a@b"
        assert (r.ne, r.ni) == (1, 1)


class TestStringifiedArrayQueries:
    """Element-wise checks for the queries whose registered output joins
    an array into a '|' string for driver hashability: splitting the
    string must recover exactly the array the pure-Python model builds."""

    def test_f2_first_tokens_elementwise(self, spark):
        import re
        docs = {r.doc_id: (r.text or "")
                for r in load_table(spark, SF, "documents").collect()}
        got = {r.doc_id: (r.first_tokens, r.n_tokens)
               for r in _QUERIES["f2_query_tokens"](spark, SF).collect()}
        assert set(got) == set(docs)
        for doc_id, text in docs.items():
            toks = re.findall(r"\w+", text.lower())
            joined, n = got[doc_id]
            assert (joined.split("|") if joined else []) == toks[:5]
            assert n == len(toks)

    def test_sources_per_lang_elementwise(self, spark):
        expect: dict[str, set] = {}
        for r in load_table(spark, SF, "documents").collect():
            expect.setdefault(r.lang, set()).add(r.source)
        rows = _QUERIES["agg_sources_per_lang"](spark, SF).collect()
        assert {r.lang for r in rows} == set(expect)
        for r in rows:
            srcs = r.sources.split("|") if r.sources else []
            assert srcs == sorted(expect[r.lang])
            assert r.n_sources == len(expect[r.lang])


def _split_postings(s: str) -> list[int]:
    """The registered query emits postings as a '|'-joined string (driver
    canonicalizer can't hash array cells); element-wise assertions split
    it back here."""
    return [int(x) for x in s.split("|")] if s else []


class TestInvertedIndex:
    def test_cap_and_df_floor_bind(self, spark):
        rows = _QUERIES["inverted_index_postings"](spark, SF).collect()
        assert rows
        assert all(r.df >= _MIN_DF for r in rows)
        assert all(
            len(_split_postings(r.postings)) == min(r.df, _POSTINGS_CAP)
            for r in rows)
        assert all(
            _split_postings(r.postings) == sorted(_split_postings(r.postings))
            for r in rows)
        # the cap binds somewhere (stopword-class tokens)
        assert any(r.df > _POSTINGS_CAP for r in rows)

    def test_postings_are_smallest_doc_ids(self, spark):
        docs = load_table(spark, SF, "documents").collect()
        token_docs: dict[str, list[int]] = {}
        import re
        for r in docs:
            for t in set(re.findall(r"\w+", (r.text or "").lower())):
                token_docs.setdefault(t, []).append(r.doc_id)
        got = {r.token: _split_postings(r.postings)
               for r in _QUERIES["inverted_index_postings"](spark, SF).collect()}
        for token, ids in token_docs.items():
            if len(ids) >= _MIN_DF:
                assert got[token] == sorted(ids)[:_POSTINGS_CAP], token


class TestCompressionRatio:
    def test_matches_local_zlib_and_discriminates(self, spark):
        expect = {
            r.doc_id: (len(r.text.encode()) if r.text else 0)
            for r in load_table(spark, SF, "documents").collect()
        }
        rows = _QUERIES["txt_compression_ratio"](spark, SF).collect()
        assert {r.doc_id for r in rows} == set(expect)
        for r in rows:
            assert r.n_bytes == expect[r.doc_id]
            assert 0.0 < r.compression_ratio
        # repetitive text compresses much harder than varied text
        rep = ("spam ham " * 200).encode()
        varied = " ".join(f"tok{i}" for i in range(400)).encode()
        df = spark.createDataFrame(
            [(1, rep.decode()), (2, varied.decode())], "doc_id long, text string")
        from crawler_spark.plans.queries_ragprep import (
            _RATIO_SCHEMA,
            compression_ratio_batches,
        )

        out = {
            r.doc_id: r.compression_ratio
            for r in df.mapInPandas(
                compression_ratio_batches, _RATIO_SCHEMA).collect()
        }
        assert out[1] < 0.1 < out[2]
        assert abs(out[1] - round(len(zlib.compress(rep, 6)) / len(rep), 6)) < 1e-9


class TestNormalize:
    def test_nfkc_kernel_exact_on_crafted_unicode(self, spark):
        import hashlib

        from crawler_spark.plans.queries_ragprep import (
            _NFKC_SCHEMA,
            nfkc_normalize_batches,
        )

        cases = [
            (1, "Café  DÉJÀ\tvu"),     # accents + ws + tab
            (2, "ﬁle ① ½"),            # NFKC: ﬁ→fi ①→1 ½→1/2
            (3, "a\x00b\x1fc"),                        # control chars
            (4, None),
            (5, "already clean"),
        ]
        df = spark.createDataFrame(cases, "doc_id long, text string")
        got = {r.doc_id: r for r in df.mapInPandas(
            nfkc_normalize_batches, _NFKC_SCHEMA).collect()}
        expect = {
            1: "cafe deja vu",
            2: "file 1 1⁄2",  # NFKC maps ½ to 1⁄2 (fraction slash)
            3: "a b c",
            4: "",
            5: "already clean",
        }
        for doc_id, want in expect.items():
            assert got[doc_id].norm_len == len(want), (doc_id, want)
            assert got[doc_id].norm_fp == hashlib.md5(
                want.encode()).hexdigest(), doc_id

    def test_expression_and_nfkc_agree_on_latin(self, spark):
        """On Latin-1-only text the fast expression path and the
        unicodedata path must produce identical normal forms."""
        import __spark_entry__ as E

        expr = {r.doc_id: (r.norm_fp, r.norm_len)
                for r in E.queries()["txt_normalize"](spark, SF).collect()}
        # rebuild the nfkc run over the SAME seeded input
        from crawler_spark.plans.queries_ragprep import (
            _NFKC_SCHEMA,
            _NORM_SEED,
            nfkc_normalize_batches,
        )
        from crawler_spark.sources import load_table

        docs = load_table(spark, SF, "documents").select(
            "doc_id", F.concat("text", F.lit(_NORM_SEED)).alias("text"))
        nfkc = {r.doc_id: (r.norm_fp, r.norm_len)
                for r in docs.mapInPandas(
                    nfkc_normalize_batches, _NFKC_SCHEMA).collect()}
        assert expr == nfkc


class TestCdcChunking:
    """Content-defined chunking: boundaries derive from local token
    windows only, so an edit perturbs O(1) chunks and the stream
    re-synchronizes — the property fixed-window chunking lacks."""

    def _chunks(self, spark, texts):
        from crawler_spark.plans.queries_ragprep import doc_chunks_cdc

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        import crawler_spark.plans.queries_ragprep as R

        orig = R.load_table
        try:
            R.load_table = lambda sp, sf, t: df
            rows = doc_chunks_cdc(spark, SF).collect()
        finally:
            R.load_table = orig
        out: dict[int, list[str]] = {}
        for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_idx)):
            out.setdefault(r.doc_id, []).append(r.chunk_text)
        return out

    def test_chunks_reconstruct_and_resynchronize(self, spark):
        base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
                "omega one two three four five six seven eight nine ten")
        # insert one token mid-document
        words = base.split()
        edited = " ".join(words[:17] + ["INSERTED"] + words[17:])
        chunks = self._chunks(spark, [base, edited.lower()])
        # reconstruction: chunks concatenated == tokenized doc
        assert " ".join(chunks[0]) == base
        assert " ".join(chunks[1]) == edited.lower()
        # resynchronization: the tail chunks (after the hash stream
        # re-syncs past the edit) are IDENTICAL between the two docs,
        # and the shared prefix chunks before the edit also match.
        tail_overlap = 0
        for a, b in zip(reversed(chunks[0]), reversed(chunks[1])):
            if a != b:
                break
            tail_overlap += 1
        prefix_overlap = 0
        for a, b in zip(chunks[0], chunks[1]):
            if a != b:
                break
            prefix_overlap += 1
        assert tail_overlap >= 1, (chunks[0], chunks[1])
        # the edit perturbs at most 2 of the original chunks; everything
        # else is shared verbatim (fixed-window chunking would shift
        # EVERY chunk after the insertion point instead)
        perturbed = len(chunks[0]) - tail_overlap - prefix_overlap
        assert perturbed <= 2, (chunks[0], chunks[1])

    def test_single_token_doc_is_one_chunk(self, spark):
        chunks = self._chunks(spark, ["solo"])
        assert chunks == {0: ["solo"]}


class TestHashedLinearClassifier:
    def test_feature_count_and_pooling_invariance(self, spark):
        from crawler_spark.plans.queries_mlprep import (
            txt_quality_linear_hashed,
        )
        import crawler_spark.plans.queries_mlprep as M

        df = spark.createDataFrame(
            [(1, "spark shuffles the sorted table"),
             (2, "spark shuffles the sorted table"),  # identical features
             (3, "solo")],
            "doc_id long, text string",
        )
        orig = M.load_table
        try:
            M.load_table = lambda sp, sf, t: df
            rows = {r.doc_id: r for r in
                    txt_quality_linear_hashed(spark, SF).collect()}
        finally:
            M.load_table = orig
        # unigrams + bigrams = 2n-1 features
        assert rows[1].n_feats == 2 * 5 - 1
        assert rows[3].n_feats == 1
        # hashing trick: identical feature multisets -> identical score
        assert rows[1].quality_logit == rows[2].quality_logit
        assert rows[1].keep == rows[2].keep
        # mean pooling keeps the logit inside the weight range
        for r in rows.values():
            assert -1.0 <= r.quality_logit <= 1.0


def test_nfkc_seed_folds_to_declared_constant():
    """The oracle embeds _NFKC_SEED_FOLDED as a literal; this pins
    that the SEED actually folds to it under the kernel's own rules —
    editing one without the other fails here, not in a driver round."""
    import pandas as pd

    from crawler_spark.plans.queries_ragprep import (
        _NFKC_SEED,
        _NFKC_SEED_FOLDED,
        nfkc_normalize_batches,
    )

    (row,) = list(nfkc_normalize_batches(
        iter([pd.DataFrame({"doc_id": [0], "text": [_NFKC_SEED]})])
    ))
    import hashlib

    expected = _NFKC_SEED_FOLDED.rstrip()
    assert row["norm_fp"][0] == hashlib.md5(
        expected.encode("utf-8")).hexdigest()
    assert int(row["norm_len"][0]) == len(expected)
