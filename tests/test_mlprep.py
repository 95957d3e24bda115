"""Tests for the training-data-prep extensions that are not (or not
fully) oracle-expressible: the approximate-percentile scale path is
bounded against the exact distribution rather than DuckDB."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_approx_percentiles_bracketed_by_exact_neighbors(spark):
    """approx_percentile returns an actual element of the data, so a
    fixed relative tolerance misfires on sparse tails (at sf0.001 a
    group's 99th percentile sits between order statistics several
    percent apart). The robust invariant: each approximate quantile
    must land INSIDE the exact neighboring-quantile bracket —
    p50 ∈ [p45, p55], p90 ∈ [p87, p93], p99 ∈ [p97, max]. The
    registered query IS that scorecard now (the driver hash gate pins
    the flags TRUE); this test re-checks it at local SF plus the
    bracket/count plumbing against an independent aggregation."""
    from crawler_spark.plans.queries_mlprep import ev_value_percentiles_approx
    from crawler_spark.sources import load_table

    card = {r.event_type: r
            for r in ev_value_percentiles_approx(spark, SF).collect()}

    ev = load_table(spark, SF, "events")
    brackets = {
        r.event_type: r
        for r in ev.groupBy("event_type").agg(
            F.expr("percentile(value, 0.45)").alias("p50_lo"),
            F.expr("percentile(value, 0.55)").alias("p50_hi"),
            F.expr("percentile(value, 0.87)").alias("p90_lo"),
            F.expr("percentile(value, 0.93)").alias("p90_hi"),
            F.expr("percentile(value, 0.97)").alias("p99_lo"),
            F.max("value").alias("p99_hi"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
    }
    assert set(card) == set(brackets) and card
    for et, a in card.items():
        b = brackets[et]
        assert a.n == b.n
        assert a.p50_in_bracket and a.p90_in_bracket and a.p99_in_bracket, (
            f"{et}: sketch quantile escaped its exact bracket: {a}"
        )
        assert abs(a.p50_lo - round(b.p50_lo, 6)) == 0
        assert abs(a.p99_hi - round(b.p99_hi, 6)) == 0


def test_approx_bins_cutpoints_and_assignments_track_exact(spark):
    """ev_value_bins_approx (sketch cutpoints) vs ev_value_bins (exact):
    every approx cutpoint lands within the exact neighborhood implied by
    the sketch's rank error, and row-level bin assignments agree for the
    overwhelming majority of rows (disagreements can only be off-by-one,
    for values squeezed between the exact and approx cutpoint)."""
    from crawler_spark.plans.queries_mlprep import (
        _N_BINS,
        ev_value_bins_approx,
    )
    from crawler_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    values = sorted(r.value for r in ev.select("value").collect())
    n = len(values)

    approx_cuts = ev.agg(
        F.approx_percentile(
            "value",
            F.array(*[F.lit(i / _N_BINS) for i in range(1, _N_BINS)]),
            F.lit(10_000),
        ).alias("qs")
    ).collect()[0].qs
    # rank-error tolerance: each approx q-quantile must sit within a
    # small rank window of the true one (1e-4 relative error on sf0.001
    # rounds up to a couple of ranks)
    slack = max(2, int(n * 1e-3))
    for i, cut in enumerate(approx_cuts, start=1):
        lo = values[max(0, int(n * i / _N_BINS) - 1 - slack)]
        hi = values[min(n - 1, int(n * i / _N_BINS) - 1 + slack)]
        assert lo <= cut <= hi, (i, cut, lo, hi)

    # the registered query reduces the same join to a one-row
    # scorecard (driver-gated); check it agrees with the raw counts
    card = ev_value_bins_approx(spark, SF).collect()
    assert len(card) == 1
    assert card[0].n_events == n
    assert card[0].agree_ok and card[0].off_by_le_one, card[0]


def test_hll_rollup_within_5pct_of_exact(spark):
    """The merged weekly sketch estimate must track the exact weekly
    distinct-user count within HLL's expected error (lgConfigK default
    12 → ~1.6% standard error; 5% is a hard ceiling), and merging
    daily sketches must equal sketching the week directly."""
    from crawler_spark.plans.queries_events import ev_hll_distinct_rollup
    from crawler_spark.sources import load_table

    approx = {r.week_start: r.approx_users
              for r in ev_hll_distinct_rollup(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    exact = {
        r.week_start: r.n
        for r in ev.select(F.date_trunc("week", "ts").alias("week_start"), "user_id")
        .distinct().groupBy("week_start").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(approx) == set(exact) and approx
    for wk, est in approx.items():
        assert abs(est - exact[wk]) <= 0.05 * exact[wk], (wk, est, exact[wk])

    # merge-of-daily == direct weekly sketch (mergeability, the property
    # that makes the rollup free at 100 TB)
    direct = {
        r.week_start: r.n
        for r in ev.groupBy(F.date_trunc("week", "ts").alias("week_start"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")).collect()
    }
    assert approx == direct


def test_dsir_scores_target_like_docs_higher(spark):
    """DSIR semantics on crafted data: raw docs written in the target's
    vocabulary must outscore raw docs written in an off-target
    vocabulary, and a doc mixing both lands in between. Longer docs in
    the same vocabulary score proportionally (per-occurrence sum)."""
    from pyspark.sql import functions as F

    from crawler_spark.plans.queries_mlprep import dsir_scores

    rows = [
        # target slice: heavy in alpha-vocabulary
        (0, "alpha beta gamma alpha beta gamma alpha beta"),
        (10, "alpha gamma beta alpha gamma alpha beta beta"),
        # raw docs
        (1, "alpha beta gamma alpha beta gamma"),     # target-like
        (2, "zeta eta theta zeta eta theta"),          # off-target
        (3, "alpha beta zeta eta theta gamma"),        # mixed
        (4, "alpha beta gamma alpha beta gamma alpha beta gamma "
            "alpha beta gamma"),                       # target-like, 2x len
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           dsir_scores(docs, F.col("doc_id") % 10 == 0).collect()}
    assert set(got) == {1, 2, 3, 4}  # target rows excluded from output
    assert got[1].score_micro > got[3].score_micro > got[2].score_micro
    assert got[2].score_micro < 0  # off-target is actively down-weighted
    # same vocabulary, double the occurrences → double the evidence
    assert got[4].score_micro == 2 * got[1].score_micro


def test_gumbel_sample_is_weighted_and_exact_k(spark):
    """sample_gumbel_weighted: exactly k rows, deterministic across
    runs, and weighted — the char-weighted draw's mean n_chars exceeds
    the corpus mean (long docs overrepresented, as ln(weight)+Gumbel
    keys guarantee in expectation; deterministic hash noise makes the
    outcome stable to assert)."""
    import __spark_entry__ as E

    from crawler_spark.plans.queries_mlprep import _GUMBEL_K
    from crawler_spark.sources import load_table

    q = E.queries()["sample_gumbel_weighted"]
    rows = q(spark, SF).collect()
    assert len(rows) == _GUMBEL_K
    again = q(spark, SF).collect()
    assert [(r.doc_id, r.key) for r in rows] == [
        (r.doc_id, r.key) for r in again]
    corpus = [r.n_chars for r in load_table(spark, SF, "documents")
              .filter("n_chars > 0").collect()]
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > sum(corpus) / len(corpus)


def test_quality_weighted_sample_rate_tracks_weight(spark):
    """Kept fraction per length band must track the keep probability:
    full-weight docs (n_chars >= 2000) are all kept; a low-weight band
    keeps roughly its mean weight's share (hash uniformity)."""
    import __spark_entry__ as E

    kept = E.queries()["sample_quality_weighted"](spark, SF)
    from crawler_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    full = docs.where("n_chars >= 2000").count()
    if full:
        assert kept.where("n_chars >= 2000").count() == full
    band = docs.where("n_chars < 1000")
    n_band = band.count()
    got = kept.where("n_chars < 1000").count()
    mean_p = band.select(
        F.avg(F.least(F.col("n_chars") / 2000.0, F.lit(1.0)))).first()[0]
    # binomial-ish tolerance: the md5 prefix is uniform, sf0.001 is small
    assert abs(got / n_band - mean_p) < 0.15, (got, n_band, mean_p)


def test_domain_rebalance_cap_binds_on_skewed_corpus(spark, tmp_path):
    """On a corpus where one source holds 60% of docs, the rebalance
    must cut that source to <= ceil(0.15 * total) while small sources
    keep all their docs."""
    import __spark_entry__ as E

    rows = [(i, f"t{i}", "en", "mega" if i < 120 else f"s{i % 4}", 10)
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = E.queries()["sample_domain_rebalance"](spark, str(tmp_path))
    per = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert per["mega"] == 30  # ceil(0.15 * 200)
    for s in ("s0", "s1", "s2", "s3"):
        assert per[s] == 20
    # deterministic: re-running yields the identical member set
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in E.queries()["sample_domain_rebalance"](
        spark, str(tmp_path)).collect()}
    assert a == b


class TestHardNegatives:
    def test_exclusions_and_labels(self, spark, tmp_path):
        """A planted exact duplicate of the query text must never
        appear in its candidate list; self is excluded; exactly one
        positive per query and it is the nearest candidate."""
        import __spark_entry__ as E

        docs = [
            (0, "the query document", "en", "s", 18),
            (1, "the query  DOCUMENT ", "en", "s", 20),  # same fingerprint as 0
            (2, "something rather different", "en", "s", 26),
            (3, "another unrelated text", "en", "s", 22),
        ]
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        vecs = [
            (0, [1.0, 0.0, 0.0, 0.0], 0),
            (1, [0.99, 0.1, 0.0, 0.0], 0),   # nearest to 0, but a duplicate
            (2, [0.7, 0.7, 0.0, 0.0], 0),
            (3, [0.0, 1.0, 0.0, 0.0], 0),
        ]
        spark.createDataFrame(
            vecs, "vec_id long, embedding array<float>, label int"
        ).write.parquet(str(tmp_path / "embeddings.parquet"))

        rows = [r for r in
                E.queries()["mine_hard_negatives"](spark, str(tmp_path)).collect()
                if r.query_id == 0]
        ids = [r.vec_id for r in rows]
        assert 0 not in ids, "self leaked into candidates"
        assert 1 not in ids, "same-fingerprint duplicate leaked in"
        assert ids == [2, 3]
        assert [r.label for r in rows] == ["positive", "negative"]
        assert rows[0].distance <= rows[1].distance


class TestBpe:
    COUNTS = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]

    def test_merge_learning_invariants(self):
        from crawler_spark.operators.bpe import (
            END_OF_WORD, encode_word, learn_merges,
        )

        merges = learn_merges(self.COUNTS, 50)
        assert merges, "classic corpus must yield merges"
        # determinism under input reordering (the tie-break is total)
        assert merges == learn_merges(list(reversed(self.COUNTS)), 50)
        ranks = {p: i for i, p in enumerate(merges)}
        for word, _ in self.COUNTS:
            pieces = encode_word(word, ranks)
            # lossless: pieces concatenate back to the word
            assert "".join(pieces) == word + END_OF_WORD
        # enough merges collapse the most frequent word to one piece
        assert encode_word("newest", ranks) == ["newest" + END_OF_WORD]
        # fewer merges never produce fewer pieces
        for k in range(len(merges)):
            rk = {p: i for i, p in enumerate(merges[:k])}
            assert len(encode_word("newest", rk)) >= len(
                encode_word("newest", ranks))

    def test_unseen_word_falls_back_to_subwords(self):
        from crawler_spark.operators.bpe import encode_word, learn_merges

        merges = learn_merges(self.COUNTS, 50)
        ranks = {p: i for i, p in enumerate(merges)}
        pieces = encode_word("lowest", ranks)  # unseen, shares both stems
        assert len(pieces) > 1 and "".join(pieces) == "lowest</w>"

    def test_distributed_encode_matches_driver_side(self, spark):
        from crawler_spark.operators.bpe import (
            encode_docs, encode_word, learn_merges, _py_tokenize,
        )

        texts = ["the lower newest table", "newest newest low!",
                 "Widest scan, lowest cost"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
        merges = learn_merges(self.COUNTS, 50)
        ranks = {p: i for i, p in enumerate(merges)}
        got = {r.doc_id: r for r in encode_docs(df, merges).collect()}
        for i, t in enumerate(texts):
            pieces = []
            for w in _py_tokenize(t):
                pieces.extend(encode_word(w, ranks))
            assert got[i].n_pieces == len(pieces)
            assert got[i].first_pieces == "|".join(pieces[:12])

    def test_train_on_fixture_is_deterministic(self, spark):
        from crawler_spark.operators.bpe import train_bpe
        from crawler_spark.sources import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        m1 = train_bpe(docs, num_merges=20, top_v=100)
        m2 = train_bpe(docs.repartition(7), num_merges=20, top_v=100)
        assert m1 == m2 and len(m1) == 20

    def test_encode_handles_null_and_non_ascii_text(self, spark):
        """NULL text must not crash the Arrow kernel, and the Python
        tokenizer mirror must agree with the JVM tokenizer on
        non-ASCII (Java \\w is ASCII-only; re.ASCII pins Python to
        the same behavior)."""
        from crawler_spark.functions import text as X
        from crawler_spark.operators.bpe import (
            _py_tokenize, encode_docs, learn_merges,
        )
        from pyspark.sql import functions as F

        texts = [(1, "Café au lait"), (2, None), (3, "naïve résumé")]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        for _, t in texts:
            if t is not None:
                jvm = df.where(F.col("text") == t).select(
                    X.tokenize("text").alias("ts")).collect()[0].ts
                assert jvm == _py_tokenize(t), t
        merges = learn_merges(self.COUNTS, 10)
        got = {r.doc_id: r for r in encode_docs(df, merges).collect()}
        assert got[2].n_pieces == 0 and got[2].first_pieces == ""
        assert got[1].n_pieces > 0


class TestRollupIncremental:
    def test_null_ts_rows_keep_a_null_day_group(self, spark):
        """maintain == recompute must hold for NULL timestamps too: a
        NULL day fails both `day < d` and `day == d`, so without the
        isNull route the row vanishes from the incremental side while
        a full recompute keeps its (NULL, type) group."""
        import crawler_spark.plans.queries_events as QE

        df = spark.createDataFrame(
            [(None, "click", 1.0), ("2024-01-01 00:00:00", "click", 2.0),
             ("2024-01-02 03:00:00", "view", 3.0)],
            "ts string, event_type string, value double",
        ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "event_type", "value")
        orig = QE.load_table
        try:
            QE.load_table = lambda sp, sf, t: df
            rows = {(r.day, r.event_type): (r.n, r.sum_value)
                    for r in QE.ev_rollup_incremental(spark, "x").collect()}
        finally:
            QE.load_table = orig
        assert rows[(None, "click")] == (1, 1.0)
        assert rows[("2024-01-01", "click")] == (1, 2.0)
        assert rows[("2024-01-02", "view")] == (1, 3.0)


class TestQuantileSketch:
    """Mergeable bottom-k quantile sketch (operators/sketch.py)."""

    def _sketched(self, spark):
        from crawler_spark.operators.sketch import (
            bottomk_sketch_agg,
            sketch_hash,
        )
        from crawler_spark.sources import load_table

        ev = load_table(spark, SF, "events").filter(
            F.col("value").isNotNull())
        return (
            ev.select(
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
                sketch_hash("event_id").alias("h"),
                F.col("value").alias("v"),
            )
            .groupBy("day")
            .agg(bottomk_sketch_agg("h", "v", 64).alias("sk"))
        )

    def test_day_state_bounded_and_sorted(self, spark):
        rows = self._sketched(spark).collect()
        assert rows, "no day sketches"
        for r in rows:
            assert len(r.sk) <= 64
            hs = [s.h for s in r.sk]
            assert hs == sorted(hs)

    def test_merge_of_subset_equals_direct_recompute(self, spark):
        """The any-range claim: merging HALF the day sketches must
        hash-equal a from-scratch bottom-k over those days' raw rows —
        for an arbitrary day subset, not just the full range (the
        registered oracle proves the full range)."""
        from crawler_spark.operators.sketch import (
            bottomk_sketch_agg,
            merge_sketches,
            sketch_hash,
        )
        from crawler_spark.sources import load_table

        daily = self._sketched(spark)
        days = sorted(r.day for r in daily.select("day").distinct().collect())
        subset = days[: max(1, len(days) // 2)]
        merged = (
            daily.filter(F.col("day").isin(subset))
            .agg(merge_sketches("sk", 64).alias("sk"))
            .first().sk
        )
        ev = load_table(spark, SF, "events").filter(
            F.col("value").isNotNull())
        direct = (
            ev.select(
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
                sketch_hash("event_id").alias("h"),
                F.col("value").alias("v"),
            )
            .filter(F.col("day").isin(subset))
            .agg(bottomk_sketch_agg("h", "v", 64).alias("sk"))
            .first().sk
        )
        assert [(s.h, s.v) for s in merged] == [(s.h, s.v) for s in direct]

    def test_quantiles_track_exact_within_sampling_error(self, spark):
        """Selection quantiles over the merged sample must be
        bracketed by the exact quantiles at q ± 3/sqrt(k) — the
        standard sampling-error envelope for a uniform k-sample."""
        import math

        from crawler_spark.plans.queries_mlprep import (
            ev_quantile_merge_rollup,
        )
        from crawler_spark.sources import load_table

        got = ev_quantile_merge_rollup(spark, SF).first()
        k = got.n_sampled
        ev = load_table(spark, SF, "events").filter(
            F.col("value").isNotNull())
        eps = 3.0 / math.sqrt(k)
        for q, v in [(0.5, got.p50), (0.9, got.p90), (0.99, got.p99)]:
            lo_q, hi_q = max(0.0, q - eps), min(1.0, q + eps)
            lo, hi = ev.agg(
                F.expr(f"percentile(value, {lo_q})"),
                F.expr(f"percentile(value, {hi_q})"),
            ).first()
            assert lo <= v <= hi, (q, v, lo, hi)


class TestUnimaxQuotas:
    """Water-filling edge cases for the UniMax allocator
    (queries_mlprep.unimax_quotas) the registered oracle can't reach:
    exact budget sum, all-capped, none-capped, remainder spread."""

    def _sizes(self, spark, rows):
        return spark.createDataFrame(rows, "lang string, s long")

    def _quotas(self, spark, rows, budget_x, epoch_cap=2):
        from crawler_spark.plans.queries_mlprep import unimax_quotas

        out = unimax_quotas(
            self._sizes(spark, rows), budget_x, epoch_cap).collect()
        return {r.lang: r for r in out}

    def test_quotas_sum_exactly_to_budget(self, spark):
        rows = [("a", 10), ("b", 100), ("c", 37), ("d", 3)]
        total = sum(s for _, s in rows)
        for x in (0.3, 0.7, 1.0, 1.5, 1.9):
            q = self._quotas(spark, rows, x)
            budget = int(x * total)
            assert sum(r.quota for r in q.values()) == budget, x
            for r in q.values():
                assert 0 <= r.quota <= 2 * r.n_docs

    def test_budget_beyond_all_caps_grants_every_cap(self, spark):
        q = self._quotas(spark, [("a", 10), ("b", 20)], 5.0, epoch_cap=2)
        assert q["a"].quota == 20 and q["b"].quota == 40
        assert q["a"].epochs == 2.0 and q["b"].epochs == 2.0

    def test_tiny_budget_splits_evenly_no_caps(self, spark):
        # budget 30 over 3 langs, all caps far above → 10 each
        q = self._quotas(
            spark, [("a", 100), ("b", 200), ("c", 300)], 0.05, epoch_cap=2)
        assert [q[l].quota for l in "abc"] == [10, 10, 10]

    def test_remainder_goes_to_first_uncapped_in_order(self, spark):
        # budget = 32: caps 4 ("t" capped: 4*... ), then 28 over 2
        # uncapped → base 14 each, remainder 0; make remainder nonzero:
        # budget 33 → base 14, rem 1 → first uncapped (by cap,lang) +1
        rows = [("tiny", 2), ("big1", 50), ("big2", 50)]
        from crawler_spark.plans.queries_mlprep import unimax_quotas

        out = {r.lang: r for r in unimax_quotas(
            self._sizes(spark, rows), 33 / 102, 2).collect()}
        assert out["tiny"].quota == 4          # capped at 2 epochs
        assert out["big1"].quota == 15         # base 14 + remainder
        assert out["big2"].quota == 14
        assert sum(r.quota for r in out.values()) == 33

    def test_monotone_in_budget(self, spark):
        rows = [("a", 10), ("b", 100), ("c", 37)]
        prev = None
        for x in (0.2, 0.5, 0.9, 1.3, 1.7):
            q = self._quotas(spark, rows, x)
            if prev is not None:
                for lang in q:
                    assert q[lang].quota >= prev[lang].quota, (lang, x)
            prev = q


class TestClassifierDistillation:
    """The NB trainer/scorer operators behind clf_distill_* — the
    registered queries' oracle parity proves engine-equivalence on the
    stub judge's (unlearnable, md5-noise) labels; these tests prove
    the trainer actually LEARNS when labels carry lexical signal, the
    property the registered eval's ceiling note defers to."""

    def _corpus(self, spark, n=400):
        # two disjoint vocabularies; label = which vocabulary wrote the
        # doc. doc_id striping keeps both classes in train AND holdout
        # under the % 5 split used by the registered queries.
        keep_words = ["theorem", "lemma", "proof", "integral", "matrix"]
        drop_words = ["click", "subscribe", "sale", "winner", "casino"]
        rows = []
        for i in range(n):
            words = keep_words if i % 2 == 0 else drop_words
            text = " ".join(words[(i + j) % 5] for j in range(12))
            rows.append((i, text, 1 - (i % 2)))
        return spark.createDataFrame(
            rows, "doc_id long, text string, keep int"
        )

    def test_learns_separable_vocabulary(self, spark):
        from crawler_spark.plans.queries_mlprep import nb_score, nb_train

        corpus = self._corpus(spark)
        train = corpus.where("doc_id % 5 != 0")
        hold = corpus.where("doc_id % 5 = 0")
        model = nb_train(train)
        scored = nb_score(hold.select("doc_id", "text"), model)
        joined = {r.doc_id: r for r in
                  scored.join(hold.select("doc_id", "keep"),
                              "doc_id").collect()}
        assert len(joined) == hold.count()
        acc = sum(
            int(r.pred_keep) == r.keep for r in joined.values()
        ) / len(joined)
        assert acc >= 0.95, f"separable-label holdout accuracy {acc}"

    def test_model_table_shape_and_prior(self, spark):
        from crawler_spark.plans.queries_mlprep import _QC_BUCKETS, nb_train

        model = nb_train(self._corpus(spark, n=60)).collect()
        priors = [r for r in model if r.bucket == -1]
        feats = [r for r in model if r.bucket >= 0]
        assert len(priors) == 1
        # balanced corpus → prior log-odds ~ ln(31/31) = 0 (30 keep /
        # 30 drop docs in n=60: ids 0..59, evens keep)
        assert priors[0].ck == 30 and priors[0].cd == 30
        assert priors[0].w_micro == 0
        assert 0 < len(feats) <= _QC_BUCKETS
        assert all(r.ck + r.cd > 0 for r in feats)
        # a keep-vocabulary bucket must carry positive weight, a
        # drop-vocabulary bucket negative
        assert max(r.w_micro for r in feats) > 0
        assert min(r.w_micro for r in feats) < 0

    def test_score_covers_exactly_docs_with_features(self, spark):
        from crawler_spark.plans.queries_mlprep import nb_score, nb_train

        corpus = self._corpus(spark, n=40)
        model = nb_train(corpus)
        docs = spark.createDataFrame(
            [(1000, "theorem proof"), (1001, ""), (1002, None)],
            "doc_id long, text string",
        )
        out = nb_score(docs, model).collect()
        # featureless docs (empty/NULL text) are not scored — routed
        # upstream by the n_chars floor, per the query docstring
        assert [r.doc_id for r in out] == [1000]
        assert out[0].pred_keep

    def test_matches_pure_python_reference(self, spark):
        """Second independent check beside the DuckDB oracle: a pure
        python NB (same md5 bucket hash, ASCII \\W+ tokenizer, HALF_UP
        micro-rounding) must agree EXACTLY with the distributed
        trainer and scorer on a corpus with overlapping vocabulary."""
        import hashlib
        import math
        import re

        from crawler_spark.plans.queries_mlprep import (
            _QC_BUCKETS,
            nb_score,
            nb_train,
        )

        noise = ["the", "and", "page", "with", "data"]
        keep_w = ["theorem", "proof", "matrix"]
        drop_w = ["casino", "sale", "winner"]
        rows = []
        for i in range(120):
            sig = keep_w if i % 2 == 0 else drop_w
            words = [sig[(i + j) % 3] if j % 2 else noise[(i + j) % 5]
                     for j in range(9)]
            rows.append((i, " ".join(words), 1 - (i % 2)))
        labeled = spark.createDataFrame(
            rows, "doc_id long, text string, keep int")

        def feats(text):
            ts = [t for t in re.split(r"\W+", text.lower(), flags=re.ASCII)
                  if t]
            return ts + [f"{a}_{b}" for a, b in zip(ts, ts[1:])]

        def bucket(f):
            return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % _QC_BUCKETS

        def rnd(x):  # Spark F.round = HALF_UP (away from zero)
            return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

        ck, cd = {}, {}
        dk = dd = 0
        for _i, text, keep in rows:
            dk += keep
            dd += 1 - keep
            for f in feats(text):
                b = bucket(f)
                (ck if keep else cd)[b] = (ck if keep else cd).get(b, 0) + 1
        buckets = sorted(set(ck) | set(cd))
        nk, nd, v = sum(ck.values()), sum(cd.values()), len(buckets)
        ref_w = {
            b: rnd((math.log(ck.get(b, 0) + 1.0) - math.log(nk + v)
                    - math.log(cd.get(b, 0) + 1.0) + math.log(nd + v)) * 1e6)
            for b in buckets
        }
        ref_w[-1] = rnd((math.log(dk + 1.0) - math.log(dd + 1.0)) * 1e6)

        model = nb_train(labeled)
        got = {r.bucket: r.w_micro for r in model.collect()}
        assert got == ref_w

        probe = spark.createDataFrame(
            [(900, rows[0][1]), (901, rows[1][1]),
             (902, "theorem casino the")],
            "doc_id long, text string",
        )
        ref_scores = {
            doc_id: sum(ref_w.get(bucket(f), 0) for f in feats(text))
            + ref_w[-1]
            for doc_id, text in
            [(900, rows[0][1]), (901, rows[1][1]), (902, "theorem casino the")]
        }
        for r in nb_score(probe, model).collect():
            assert r.score_micro == ref_scores[r.doc_id], r
            assert r.pred_keep == (ref_scores[r.doc_id] > 0)
