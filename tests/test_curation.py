"""Invariant tests for the corpus-curation operators
(plans/queries_curation.py) beyond the DuckDB value parity that
test_oracle_parity.py already provides: packing budget/contiguity
invariants, incremental-vs-all-pairs consistency, keep-best group
properties, and a Python recomputation of the repetition ratio."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

_QUERIES = E.queries()


class TestPacking:
    def test_budget_and_contiguity_invariants(self, spark):
        rows = _QUERIES["pack_token_budget"](spark, SF).collect()
        # every doc assigned exactly once
        assert len({r.doc_id for r in rows}) == len(rows)
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r.shard_id, []).append(r)
        assert set(by_shard) <= {0, 1, 2, 3}
        for shard, rs in by_shard.items():
            packs: dict[int, list] = {}
            for r in rs:
                packs.setdefault(r.pack_seq, []).append(r)
            seqs = sorted(packs)
            # pack ids are contiguous from 0 (first-fit never skips)
            assert seqs == list(range(len(seqs))), (shard, seqs)
            max_doc = max(r.n_tokens for r in rs)
            for seq, members in packs.items():
                total = sum(r.n_tokens for r in members)
                # first-fit overshoot: a pack closes when the running sum
                # crosses the budget, so it holds < budget + one max doc
                assert total < 512 + max_doc, (shard, seq, total)

    def test_deterministic_across_runs(self, spark):
        a = {(r.doc_id, r.shard_id, r.pack_seq)
             for r in _QUERIES["pack_token_budget"](spark, SF).collect()}
        b = {(r.doc_id, r.shard_id, r.pack_seq)
             for r in _QUERIES["pack_token_budget"](spark, SF).collect()}
        assert a == b

    def test_emitted_sequences_reconstruct_assignment(self, spark):
        """pack_sequences_emit is the materialization of
        pack_token_budget: splitting packed_text on the EOS separator
        must recover exactly the member documents of that pack, in the
        deterministic (hash, doc_id) order, with matching counts."""
        from crawler_spark.plans.queries_curation import _EOS
        from crawler_spark.sources import load_table

        assign: dict[tuple[int, int], list] = {}
        for r in _QUERIES["pack_token_budget"](spark, SF).collect():
            assign.setdefault((r.shard_id, r.pack_seq), []).append(r)
        texts = {r.doc_id: (r.text or "")
                 for r in load_table(spark, SF, "documents").collect()}
        import hashlib

        def key(doc_id):
            return hashlib.md5(str(doc_id).encode()).hexdigest()

        emitted = _QUERIES["pack_sequences_emit"](spark, SF).collect()
        assert {(r.shard_id, r.pack_seq) for r in emitted} == set(assign)
        for r in emitted:
            members = sorted(
                assign[(r.shard_id, r.pack_seq)],
                key=lambda m: (key(m.doc_id), m.doc_id))
            assert r.n_docs == len(members)
            assert r.pack_tokens == sum(m.n_tokens for m in members)
            assert r.packed_text.split(_EOS) == [
                texts[m.doc_id] for m in members]


class TestKeepBest:
    def test_one_kept_per_group_and_kept_is_longest(self, spark):
        from crawler_spark.sources import load_table

        rows = _QUERIES["dedup_keep_best"](spark, SF).collect()
        docs = {r.doc_id: r.text for r in
                load_table(spark, SF, "documents").collect()}
        by_kept: dict[int, list] = {}
        for r in rows:
            by_kept.setdefault(r.kept_id, []).append(r)
        for kept_id, members in by_kept.items():
            # exactly one is_kept row per group, and it is the kept_id
            kept_rows = [r for r in members if r.is_kept]
            assert len(kept_rows) == 1 and kept_rows[0].doc_id == kept_id
            # the kept doc's text is at least as long as every member's
            klen = len(docs[kept_id])
            assert all(len(docs[r.doc_id]) <= klen for r in members)


class TestIncrementalDedup:
    def test_flags_match_cross_split_exact_pairs(self, spark):
        """A batch doc is flagged iff the exact all-pairs generator
        (threshold 0.5) contains a pair linking it across the
        batch/corpus split, and max_jaccard agrees with that pair set."""
        from crawler_spark.plans.queries_text import ngram_jaccard_pairs
        from crawler_spark.sources import load_table

        docs = load_table(spark, SF, "documents")
        out = {r.doc_id: r for r in
               _QUERIES["dedup_incremental"](spark, SF).collect()}
        batch_ids = set(out)
        # cross-split qualifying pairs from the oracle-checked generator
        pairs = ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.5).collect()
        best: dict[int, float] = {}
        for p in pairs:
            for a, b in ((p.id_a, p.id_b), (p.id_b, p.id_a)):
                if a in batch_ids and b not in batch_ids:
                    best[a] = max(best.get(a, 0.0), p.jaccard)
        flagged = {d for d, r in out.items() if r.is_near_dup}
        assert flagged == set(best), (flagged ^ set(best))
        for d, j in best.items():
            assert abs(out[d].max_jaccard - j) < 1e-9

    def test_every_batch_doc_present_even_without_matches(self, spark):
        out = _QUERIES["dedup_incremental"](spark, SF)
        n_batch = out.count()
        zero = out.filter(~F.col("is_near_dup")).count()
        assert n_batch > 0 and zero > 0  # unmatched docs not dropped


class TestRepetitionRatio:
    def test_matches_python_recount(self, spark):
        from crawler_spark.sources import load_table

        got = {r.doc_id: r for r in
               _QUERIES["txt_repetition_ratio"](spark, SF).collect()}
        for row in load_table(spark, SF, "documents").limit(50).collect():
            toks = [t for t in re.split(r"\W+", row.text.lower()) if t]
            want = (max(Counter(toks).values()) / len(toks)) if toks else 0.0
            r = got[row.doc_id]
            assert r.n_tokens == len(toks)
            assert abs(r.top_token_share - round(want, 6)) < 1e-9
            assert 0.0 <= r.top_token_share <= 1.0

    def test_top_element_count_sorted_run_equivalence(self, spark):
        """Property: the O(n log n) sorted-run top_element_count equals
        a Python Counter max on random token lists AND on the
        adversarial shapes the old O(distinct·n) form choked on — a
        long degenerate repetition (one token dominating) and an
        all-distinct list (distinct ≈ n, the worst quadratic case)."""
        import random

        from pyspark.sql import functions as F

        from crawler_spark.functions.text import top_element_count

        rng = random.Random(8)
        cases = [
            [],
            ["a"],
            ["buy"] * 5000 + ["now"] * 7,          # degenerate repetition
            [f"t{i}" for i in range(4000)],        # all distinct
            [rng.choice("abcdefg") for _ in range(500)],
        ] + [
            [rng.choice(["x", "y", "z", "w"]) for _ in range(rng.randint(0, 40))]
            for _ in range(30)
        ]
        df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cases)], "id long, toks array<string>")
        got = {r.id: r.top for r in df.select(
            "id", top_element_count(F.col("toks")).alias("top")).collect()}
        for i, c in enumerate(cases):
            want = max(Counter(c).values()) if c else 0
            assert got[i] == want, (i, got[i], want)


class TestCalibrationFloors:
    """Asserted floors on the curation-measurement queries (the ANN
    recall-floor pattern): the oracle parity gate proves the numbers
    are COMPUTED right, these prove they MEAN what the report claims —
    a silent drift in the stub judge, the hashed classifier, or the
    decile plumbing fails loudly here."""

    def test_judge_calibration_agreement_floor(self, spark):
        rows = sorted(
            _QUERIES["curation_judge_calibration"](spark, SF).collect(),
            key=lambda r: r.decile)
        assert [r.decile for r in rows] == list(range(1, 11))
        total = sum(r.n_docs for r in rows)
        overall = sum(r.agreement * r.n_docs for r in rows) / total
        # measured 0.656 at sf0.001 / 0.668 at sf0.01; chance for these
        # marginals would sit near 0.5 — the floor catches a judge or
        # classifier drift that decouples the two gates
        assert overall >= 0.60, overall
        # classifier keep-rate must be non-decreasing across logit
        # deciles: keep == logit > 0 and deciles are ordered by logit,
        # so any inversion means the decile tiling is broken
        clf_rates = [r.clf_keeps / r.n_docs for r in rows]
        assert all(a <= b + 1e-9 for a, b in zip(clf_rates, clf_rates[1:])), \
            clf_rates
        for r in rows:
            assert 0.0 <= r.agreement <= 1.0

    def test_threshold_sweep_monotone(self, spark):
        rows = sorted(
            _QUERIES["curation_threshold_sweep"](spark, SF).collect(),
            key=lambda r: r.cutoff)
        assert [r.cutoff for r in rows] == list(range(0, 101, 10))
        keeps = [r.n_keep for r in rows]
        assert all(a >= b for a, b in zip(keeps, keeps[1:])), keeps
        assert rows[0].keep_rate == 1.0  # cutoff 0 keeps everything
        assert keeps[-1] < keeps[0]  # the gate actually bites
        for r in rows:
            assert abs(r.keep_rate - r.n_keep / keeps[0]) < 1e-6


class TestExportPipeline:
    def test_equals_stagewise_composition(self, spark):
        """The one-plan export equals running keep-best dedup → quality
        filters → packing as separate oracle-checked stages."""
        from crawler_spark.functions import text as X
        from crawler_spark.sources import load_table

        got = {(r.doc_id, r.shard_id, r.pack_seq)
               for r in _QUERIES["corpus_export_pipeline"](spark, SF).collect()}

        docs = load_table(spark, SF, "documents")
        kept_rows = _QUERIES["dedup_keep_best"](spark, SF).collect()
        kept_ids = {r.doc_id for r in kept_rows if r.is_kept}
        stats = docs.select(
            "doc_id", "n_chars", X.word_token_count("text").alias("n_tokens")
        ).collect()
        survivors = {
            r.doc_id
            for r in stats
            if r.doc_id in kept_ids
            and r.n_chars >= 200
            and r.n_tokens >= 30
            and r.n_chars / r.n_tokens <= 12.0
        }
        assert {d for d, _, _ in got} == survivors


class TestTrainValSplit:
    def test_leaked_train_duplicates_dropped(self, spark, tmp_path):
        """A train doc sharing a val doc's normalized fingerprint must
        be dropped; distinct train docs survive; val is untouched."""
        import hashlib

        def is_val(doc_id):
            return hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:2] < "1a"

        # find a doc_id in each split deterministically
        val_id = next(i for i in range(1000) if is_val(i))
        train_ids = [i for i in range(1000) if not is_val(i)][:3]
        rows = [(val_id, "the shared text", "en", "s", 15)]
        # train_ids[0] duplicates the val doc (modulo whitespace case)
        rows.append((train_ids[0], "  THE   shared TEXT ", "en", "s", 15))
        rows.append((train_ids[1], "something else entirely", "en", "s", 23))
        rows.append((train_ids[2], "a third unique document", "en", "s", 23))
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long")
        df.write.parquet(str(tmp_path / "documents.parquet"))

        import __spark_entry__ as E

        got = {r.doc_id: r.split for r in
               E.queries()["corpus_train_val_split"](spark, str(tmp_path)).collect()}
        assert got[val_id] == "val"
        assert train_ids[0] not in got, "leaked duplicate survived into train"
        assert got[train_ids[1]] == "train"
        assert got[train_ids[2]] == "train"


class TestRepeatedSpans:
    def test_keep_first_occurrence_and_rewrite(self, spark):
        """Hand-built corpus: doc 1 repeats doc 0's span AND its own
        first span; keep-first is corpus-global by (doc_id, span_idx)."""
        from crawler_spark.operators.dedup import dedup_repeated_spans

        df = spark.createDataFrame(
            [
                (0, "a b c d x y z w"),          # spans: "a b c d", "x y z w"
                (1, "a b c d a b c d q r s t"),  # first span dups doc 0, second dups its own
                (2, "q r s t fresh span here ok"),
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in dedup_repeated_spans(df, span_tokens=4).collect()}
        assert got[0].text_clean == "a b c d x y z w"
        assert got[0].n_removed == 0
        # doc 1: both "a b c d" spans removed (doc 0 owns the first
        # occurrence), "q r s t" kept (doc 1 precedes doc 2)
        assert got[1].text_clean == "q r s t"
        assert got[1].n_removed == 2 and got[1].n_spans == 3
        assert got[2].text_clean == "fresh span here ok"
        assert got[2].n_removed == 1

    def test_fully_duplicated_doc_becomes_empty(self, spark):
        from crawler_spark.operators.dedup import dedup_repeated_spans

        df = spark.createDataFrame(
            [(0, "p q r s"), (1, "p q r s")], "doc_id long, text string")
        got = {r.doc_id: r for r in dedup_repeated_spans(df, span_tokens=4).collect()}
        assert got[0].text_clean == "p q r s"
        assert got[1].text_clean == "" and got[1].n_removed == 1

    def test_partial_tail_span_deduped_like_any_other(self, spark):
        from crawler_spark.operators.dedup import dedup_repeated_spans

        df = spark.createDataFrame(
            [(0, "a b c d tail bit"), (1, "tail bit")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in dedup_repeated_spans(df, span_tokens=4).collect()}
        assert got[0].n_removed == 0
        assert got[1].text_clean == "" and got[1].n_removed == 1


class TestBigramLogprob:
    def test_hand_computed_tiny_corpus(self, spark, tmp_path):
        """Python recomputation of the smoothed bigram score on a
        3-doc corpus written as a documents table."""
        import math
        import re
        from collections import Counter

        rows = [
            (0, "the cat sat", "en", "s", 11),
            (1, "the cat ran", "en", "s", 11),
            (2, "dog", "en", "s", 3),  # < 2 tokens → no output row
        ]
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(str(tmp_path / "documents.parquet"))

        import __spark_entry__ as E

        got = {r.doc_id: r for r in
               E.queries()["txt_bigram_logprob"](spark, str(tmp_path)).collect()}

        texts = {i: [t for t in re.split(r"\W+", s.lower()) if t]
                 for i, s, *_ in rows}
        grams = [(ts[i], ts[i + 1]) for ts in texts.values()
                 for i in range(len(ts) - 1)]
        cbg, cleft = Counter(grams), Counter(g[0] for g in grams)
        v = len({t for ts in texts.values() for t in ts})
        for doc in (0, 1):
            ts = texts[doc]
            lnp = [round(math.log((cbg[(a, b)] + 1.0) / (cleft[a] + v)), 6)
                   for a, b in zip(ts, ts[1:])]
            want = round(sum(lnp) / len(lnp), 6)
            assert got[doc].n_bigrams == len(lnp)
            assert got[doc].avg_logprob == pytest.approx(want, abs=1e-9)
        assert 2 not in got

    def test_repeated_text_scores_higher(self, spark, tmp_path):
        """A document made of the corpus's most common bigrams scores
        above a doc of unique-once bigrams (the gibberish direction)."""
        rows = [(i, "alpha beta alpha beta alpha beta", "en", "s", 32)
                for i in range(3)]
        rows.append((9, "zeta omega kappa", "en", "s", 16))
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(str(tmp_path / "documents.parquet"))

        import __spark_entry__ as E

        got = {r.doc_id: r.avg_logprob for r in
               E.queries()["txt_bigram_logprob"](spark, str(tmp_path)).collect()}
        assert got[0] > got[9]


class TestPerplexityBuckets:
    def test_bucket_rates_and_membership(self, spark):
        """Head kept whole; middle ≈ half; tail ≈ tenth; buckets follow
        the score order (worst scores only in the tail bucket)."""
        import __spark_entry__ as E

        sf = "/root/testdata/sf0.001"
        rows = E.queries()["sample_perplexity_buckets"](spark, sf).collect()
        scores = {r.doc_id: r for r in
                  E.queries()["txt_bigram_logprob"](spark, sf).collect()}
        n = len(scores)
        per = {1: 0, 2: 0, 3: 0}
        for r in rows:
            per[r.bucket] += 1
            assert r.avg_logprob == scores[r.doc_id].avg_logprob
        third = n / 3
        assert per[1] >= third - 1          # head: kept in full
        assert per[2] < per[1]               # middle: thinned
        assert per[3] < per[2]               # tail: thinned hardest
        # bucket ordering follows the score: every head member scores
        # >= every tail member
        head_min = min(r.avg_logprob for r in rows if r.bucket == 1)
        tail_max = max(r.avg_logprob for r in rows if r.bucket == 3)
        assert head_min >= tail_max


class TestBlocklistOperator:
    """filter_blocked_domains (functions/url.py): both arms, NULL
    semantics, and the size switch itself."""

    _ROWS = [
        (1, "www.bad.example.com"),   # suffix of a blocked entry
        (2, "bad.example.com"),       # exact match
        (3, "notbad.example.com"),    # substring, NOT a dot suffix
        (4, "good.example.org"),      # clean
        (5, None),                    # NULL domain: always KEPT
    ]

    def _run(self, spark, blocklist):
        from crawler_spark.functions.url import filter_blocked_domains

        df = spark.createDataFrame(self._ROWS, "doc_id int, domain string")
        out = filter_blocked_domains(df, blocklist)
        return sorted(r.doc_id for r in out.collect())

    def test_small_arm(self, spark):
        assert self._run(spark, ["bad.example.com", "dead.invalid"]) == \
            [3, 4, 5]

    def test_big_arm_same_semantics(self, spark):
        # inline_limit=0 cannot be hit by a 2-entry list — force the
        # explode+semi arm and demand identical keep-set
        from crawler_spark.functions.url import filter_blocked_domains

        df = spark.createDataFrame(self._ROWS, "doc_id int, domain string")
        out = filter_blocked_domains(
            df, ["bad.example.com", "dead.invalid"], inline_limit=0)
        assert sorted(r.doc_id for r in out.collect()) == [3, 4, 5]

    def test_dataframe_blocklist_takes_big_arm(self, spark):
        bl = spark.createDataFrame(
            [("bad.example.com",)], "entry string")
        assert self._run(spark, bl) == [3, 4, 5]

    def test_duplicate_keys_filter_per_row_in_both_arms(self, spark):
        """Review-found: a key-only anti join in the big arm dropped
        EVERY row of a key that had one blocked domain. Both arms must
        filter per (key, domain) row."""
        from crawler_spark.functions.url import filter_blocked_domains

        rows = [(7, "bad.example.com"), (7, "good.example.org"),
                (8, "good.example.org")]
        df = spark.createDataFrame(rows, "doc_id int, domain string")
        for limit in (10, 0):  # small arm, then forced big arm
            out = filter_blocked_domains(
                df, ["bad.example.com"], inline_limit=limit)
            got = sorted((r.doc_id, r.domain) for r in out.collect())
            assert got == [(7, "good.example.org"),
                           (8, "good.example.org")], limit

    def test_null_key_blocked_domain_drops_in_both_arms(self, spark):
        """Review-found: the big arm's plain-equality anti-join never
        matches NULL = NULL, so a NULL-key row with a blocked domain
        leaked through the big arm while the small arm's per-row
        filter dropped it. Null-safe equality closes the divergence."""
        from crawler_spark.functions.url import filter_blocked_domains

        rows = [(None, "bad.example.com"), (2, "bad.example.com"),
                (3, "ok.example.org"), (None, None)]
        df = spark.createDataFrame(rows, "doc_id int, domain string")
        for limit in (10, 0):
            out = filter_blocked_domains(
                df, ["bad.example.com"], inline_limit=limit)
            got = sorted(((r.doc_id, r.domain) for r in out.collect()),
                         key=repr)
            # blocked domains drop regardless of key nullness; the
            # NULL-domain row is always kept (nothing matches NULL)
            assert got == sorted([(3, "ok.example.org"), (None, None)],
                                 key=repr), (limit, got)

    def test_case_insensitive_both_arms(self, spark):
        """DNS hostnames are case-insensitive and UT1 feeds are
        lowercase; mixed-case crawl domains must still block."""
        from crawler_spark.functions.url import filter_blocked_domains

        df = spark.createDataFrame(
            [(1, "WWW.Bad.Example.COM"), (2, "ok.example.org")],
            "doc_id int, domain string")
        for limit in (10, 0):
            out = filter_blocked_domains(
                df, ["bad.EXAMPLE.com"], inline_limit=limit)
            assert [r.doc_id for r in out.collect()] == [2], limit

    def test_switch_threshold(self, spark):
        """A list one past inline_limit switches plans (join appears);
        at the limit it stays a pure projection."""
        from tests.test_plan_shapes import plan_text

        from crawler_spark.functions.url import filter_blocked_domains

        df = spark.createDataFrame(self._ROWS, "doc_id int, domain string")
        small = plan_text(filter_blocked_domains(
            df, ["a.invalid", "b.invalid"], inline_limit=2))
        big = plan_text(filter_blocked_domains(
            df, ["a.invalid", "b.invalid", "c.invalid"], inline_limit=2))
        assert "Join" not in small
        assert "BroadcastHashJoin" in big


class TestLineDedupSkew:
    """drop_frequent_lines on an ADVERSARIALLY skewed corpus — the
    input the r9 skew-safe rewrite exists for: one boilerplate line in
    EVERY row (the key a window-based frequency count would send to a
    single task), one mid-frequency footer crossing the threshold, and
    a unique prose line per row that must survive verbatim."""

    def test_hot_line_corpus(self, spark):
        from pyspark.sql import functions as F

        from crawler_spark.functions.text import drop_frequent_lines

        n = 100_000
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                "\n",
                F.lit("HOT BOILERPLATE ON EVERY PAGE"),   # count = n
                F.concat(F.lit("prose-"), F.col("id")),    # count = 1
                F.concat(F.lit("footer-"),                 # count = n/100
                         (F.col("id") % 100).cast("string")),
            ).alias("page"),
        )
        out = drop_frequent_lines(docs, "page", threshold=5)
        rows = out.orderBy("doc_id").collect()
        assert len(rows) == n
        # hot + footer lines dropped everywhere; prose intact, alone
        sample = {r.doc_id: r.main_content for r in rows[:3] + rows[-3:]}
        for doc_id, content in sample.items():
            assert content == f"prose-{doc_id}", (doc_id, content)

    def test_all_boilerplate_page_contributes_no_row(self, spark):
        """The documented cardinality contract: a page with NO
        surviving lines (all corpus-frequent) yields no output row —
        the SQL regroup semantics both engines share."""
        from pyspark.sql import functions as F

        from crawler_spark.functions.text import drop_frequent_lines

        docs = spark.range(50).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 10, F.lit("CHROME\nFOOTER"))
            .otherwise(F.concat(F.lit("CHROME\nu-"), F.col("id")))
            .alias("page"),
        )
        out = drop_frequent_lines(docs, "page", threshold=5).collect()
        ids = sorted(r.doc_id for r in out)
        assert ids == list(range(10, 50))  # nav-only pages vanish
        assert all(r.main_content == f"u-{r.doc_id}" for r in out)

    def test_dropset_too_big_for_comfort_still_correct(self, spark):
        """broadcast_dropset=False (the documented degrade path when
        the boilerplate vocabulary outgrows a broadcast) returns the
        identical answer through a shuffle anti-join."""
        from pyspark.sql import functions as F

        from crawler_spark.functions.text import drop_frequent_lines

        docs = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                "\n",
                F.lit("CHROME"),
                F.concat(F.lit("u-"), F.col("id")),
            ).alias("page"),
        )
        a = {(r.doc_id, r.main_content) for r in
             drop_frequent_lines(docs, "page", threshold=5).collect()}
        b = {(r.doc_id, r.main_content) for r in
             drop_frequent_lines(docs, "page", threshold=5,
                                 broadcast_dropset=False).collect()}
        assert a == b
        assert all(c == f"u-{i}" for i, c in a)
