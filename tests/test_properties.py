"""Property-based tests (hypothesis) for the pure scalar kernels —
the invariants the reference's behavior implies must hold for ANY
input, not just fixtures: normalize/pad algebra (V2-V4), fingerprint
whitespace-invariance, snippet bounds, stub determinism."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.functions.embedding import StubEmbedder, normalize_pad

finite_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
vectors = st.lists(finite_floats, min_size=0, max_size=40)


class TestStemmerLockstep:
    """The stemmer exists twice — a Column expression for document
    tokens and a Python mirror for query terms (functions/text.py).
    ts_match(stem=True) compares their outputs for EQUALITY, so any
    drift between the two silently breaks matching. Property: they
    agree on every token."""

    def test_expression_and_python_stemmer_agree_on_corpus(self, spark):
        """Deterministic corpus variant (hypothesis can't take the
        spark fixture per-example without re-launching jobs): every
        suffix-rule branch plus real document tokens."""
        from pyspark.sql import functions as F

        from crawler_spark.functions.text import _stem_str, _stem_token

        handpicked = [
            "joining", "joined", "joins", "join", "tables", "classes",
            "ponies", "pass", "passes", "as", "is", "being", "ing",
            "merge", "merges", "merged", "merging", "red", "sses",
            "use", "used", "uses", "using", "e", "s", "ss", "ed",
        ]
        doc_tokens = [
            r.t for r in (
                spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
                .select(F.explode(F.split(F.lower("text"), r"\W+")).alias("t"))
                .filter("t != ''").distinct().limit(500).collect()
            )
        ]
        tokens = handpicked + doc_tokens
        df = spark.createDataFrame([(t,) for t in tokens], "tok string")
        got = {r.tok: r.stemmed
               for r in df.select("tok", _stem_token(F.col("tok")).alias("stemmed")).collect()}
        mismatches = {t: (got[t], _stem_str(t)) for t in tokens
                      if got[t] != _stem_str(t)}
        assert not mismatches, f"stemmer drift: {dict(list(mismatches.items())[:5])}"


class TestMergeByKeyModel:
    """merge_by_key vs a dict model over random interleavings of
    existing/incoming rows with colliding keys and NULL/equal recency
    (same spirit as the lakehouse model-check in test_txn). The
    contract: exactly one survivor per key; any incoming row beats
    every existing row; among candidates with distinct recency the
    max recency wins (NULLs last); on exact (priority, recency) ties
    the survivor may be any of the tied rows — the model checks
    membership in the tied set, not a specific pick."""

    def _cases(self):
        import random

        rng = random.Random(20260814)
        cases = []
        for case_id in range(300):
            rows = []
            for uid in range(rng.randint(1, 8)):
                rows.append((
                    case_id,
                    rng.randint(0, 2),                      # key (collides)
                    rng.choice(["existing", "incoming"]),
                    rng.choice([None, 0, 1, 1, 2]),          # recency w/ ties
                    uid,
                ))
            cases.append(rows)
        return cases

    def test_matches_dict_model_with_ties_and_nulls(self, spark):
        from pyspark.sql import functions as F

        from crawler_spark.operators.upsert import merge_by_key

        cases = self._cases()
        flat = [r for rows in cases for r in rows]
        schema = "case_id int, key int, side string, recency int, uid int"
        df = spark.createDataFrame(flat, schema).withColumn(
            "ck", F.concat_ws("_", "case_id", "key"))
        ex = df.filter("side = 'existing'")
        inc = df.filter("side = 'incoming'")
        got = merge_by_key(ex, inc, key="ck", recency_col="recency").collect()

        # model: per composite key, the allowed-winner uid set
        allowed: dict[str, set] = {}
        for rows in cases:
            by_key: dict[tuple, list] = {}
            for case_id, key, side, recency, uid in rows:
                by_key.setdefault((case_id, key), []).append(
                    (side, recency, uid))
            for (case_id, key), rs in by_key.items():
                inc_rows = [r for r in rs if r[0] == "incoming"]
                cand = inc_rows if inc_rows else rs
                with_rec = [r for r in cand if r[1] is not None]
                best = max(r[1] for r in with_rec) if with_rec else None
                tied = ([r for r in with_rec if r[1] == best]
                        if with_rec else cand)
                allowed[f"{case_id}_{key}"] = {r[2] for r in tied}

        assert len(got) == len(allowed), "one survivor per key"
        for r in got:
            assert r["uid"] in allowed[r["ck"]], (
                f"key {r['ck']}: survivor uid {r['uid']} not in allowed "
                f"set {allowed[r['ck']]}")

    def test_incoming_always_beats_future_dated_existing(self, spark):
        from crawler_spark.operators.upsert import merge_by_key

        ex = spark.createDataFrame(
            [(1, "old", 999)], "k int, v string, recency int")
        inc = spark.createDataFrame(
            [(1, "new", 1)], "k int, v string, recency int")
        out = merge_by_key(ex, inc, key="k", recency_col="recency").collect()
        assert len(out) == 1 and out[0]["v"] == "new"


class TestNormalizePadProperties:
    @given(vectors, st.integers(min_value=1, max_value=64))
    @settings(max_examples=200, deadline=None)
    def test_output_length_always_dims(self, v, dims):
        assert len(normalize_pad(v, dims)) == dims

    @given(vectors.filter(lambda v: any(abs(x) > 1e-6 for x in v)),
           st.integers(min_value=1, max_value=64))
    @settings(max_examples=200, deadline=None)
    def test_norm_at_most_one(self, v, dims):
        """Normalize-then-pad: unit norm when nothing is truncated,
        ≤ 1 when truncation drops components — never > 1."""
        out = normalize_pad(v, dims)
        n = math.sqrt(sum(x * x for x in out))
        assert n <= 1.0 + 1e-9
        if len(v) <= dims:
            assert n == pytest_approx(1.0)

    @given(st.integers(min_value=1, max_value=64))
    @settings(max_examples=50, deadline=None)
    def test_zero_vector_passthrough(self, dims):
        assert normalize_pad([0.0] * 3, dims) == [0.0] * dims

    @given(vectors, st.integers(min_value=1, max_value=64))
    @settings(max_examples=100, deadline=None)
    def test_idempotent_when_not_truncating(self, v, dims):
        """normalize_pad(normalize_pad(x)) == normalize_pad(x) whenever
        the input fits in dims — the ingest case (model dims == stored
        dims, pad only). Truncation genuinely breaks idempotence
        (normalize-THEN-truncate drops norm; re-normalizing rescales —
        reference order, embeddings.py:52-56 after :65-71), so the
        property is scoped to the invariant the pipeline relies on."""
        if len(v) > dims:
            v = v[:dims]
        once = normalize_pad(v, dims)
        twice = normalize_pad(once, dims)
        assert all(abs(a - b) < 1e-9 for a, b in zip(once, twice))


class TestStubEmbedderProperties:
    @given(st.text(max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_deterministic_and_unit(self, text):
        e = StubEmbedder(dims=16)
        a, b = e.embed_text(text), e.embed_text(text)
        assert a == b and len(a) == 16
        n = math.sqrt(sum(x * x for x in a))
        assert abs(n - 1.0) < 1e-9


class TestTsqueryParserProperties:
    """Round-trip property for the tsquery parser (functions/text.py):
    any AST rendered to a query string with explicit operators parses
    back to the SAME AST — precedence and parenthesization can never
    silently reassociate a user's query. Driver-side only (no Spark)."""

    @staticmethod
    def _asts(depth):
        term = st.from_regex(r"[a-z][a-z0-9]{0,5}", fullmatch=True).map(
            lambda t: ("term", t))
        prefix = st.from_regex(r"[a-z][a-z0-9]{0,5}", fullmatch=True).map(
            lambda t: ("prefix", t))
        leaf = st.one_of(term, prefix)
        return st.recursive(
            leaf,
            lambda inner: st.one_of(
                st.tuples(st.just("not"), inner),
                st.tuples(st.just("and"), inner, inner),
                st.tuples(st.just("or"), inner, inner),
                st.tuples(st.just("phrase"), st.integers(0, 5),
                          inner, inner),
            ),
            max_leaves=depth,
        )

    @staticmethod
    def _render(node) -> str:
        kind = node[0]
        if kind == "term":
            return node[1]
        if kind == "prefix":
            return f"{node[1]}:*"
        r = TestTsqueryParserProperties._render
        if kind == "not":
            return f"!({r(node[1])})"
        if kind == "phrase":
            return f"({r(node[2])}) <{node[1]}> ({r(node[3])})"
        op = "&" if kind == "and" else "|"
        return f"({r(node[1])}) {op} ({r(node[2])})"

    @given(_asts.__func__(12))
    @settings(max_examples=300, deadline=None)
    def test_render_parse_roundtrip(self, ast):
        from crawler_spark.functions.text import _tsquery_parse

        assert _tsquery_parse(self._render(ast)) == ast

    def test_precedence_not_over_and_over_or(self):
        from crawler_spark.functions.text import _tsquery_parse

        assert _tsquery_parse("a | b & !c") == (
            "or", ("term", "a"),
            ("and", ("term", "b"), ("not", ("term", "c"))))


class TestFingerprintProperties:
    @given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                   max_size=300))
    @settings(max_examples=15, deadline=None)  # each example is a Spark job
    def test_whitespace_runs_do_not_change_fingerprint(self, spark, text):
        """The dedup fingerprint md5(trim(collapse_ws(lower(t)))) must be
        invariant under doubling every space — the normalization the
        oracle SQL mirrors."""
        from pyspark.sql import functions as F

        from crawler_spark.functions import text as X

        doubled = text.replace(" ", "  ")
        df = spark.createDataFrame([(text, doubled)], "a string, b string")
        row = df.select(
            X.fingerprint("a").alias("fa"),
            X.fingerprint("b").alias("fb"),
            (F.lower(F.trim(F.regexp_replace("a", r"\s+", " "))) ==
             F.lower(F.trim(F.regexp_replace("b", r"\s+", " ")))).alias("same_norm"),
        ).collect()[0]
        assert (row.fa == row.fb) == bool(row.same_norm)


def pytest_approx(x):
    import pytest

    return pytest.approx(x, abs=1e-9)


class TestShingleFoldEquivalence:
    """word_shingles was rewritten from transform-with-slice to a
    zip_with fold (the O(len²) tokenizer-inlining fix). Property: the
    fold produces EXACTLY the reference k-gram list for any text and
    any k — including short texts, repeated tokens, and punctuation
    splits."""

    def test_fold_matches_python_reference_on_generated_texts(self, spark):
        import re

        from pyspark.sql import functions as F

        from crawler_spark.functions.text import word_shingles

        texts = [
            "", "a", "a b", "a  b   c", "x x x x x", "one-two three,four",
            "tab\tand\nnewline tokens", "UPPER lower MiXeD case words",
            "a b c d e f g h i j", "trailing space ", "  leading",
            "punct!!! only??? here...", "ab ab ab ab",
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "id long, text string")
        for k in (1, 2, 3, 5):
            got = {r.id: r.s for r in
                   df.select("id", word_shingles("text", k).alias("s")).collect()}
            for i, t in enumerate(texts):
                toks = [w for w in re.split(r"\W+", t.lower()) if w]
                want = [" ".join(toks[j:j + k])
                        for j in range(len(toks) - k + 1)]
                assert got[i] == want, (k, t, got[i], want)


class TestBloomProperties:
    @given(st.sets(st.integers(min_value=-2**40, max_value=2**40),
                   min_size=1, max_size=200))
    @settings(max_examples=20, deadline=None)
    def test_no_false_negatives_python_model(self, keys):
        """Model the expression arithmetic in Python (same xxhash64 →
        pmod → word/bit math is exercised JVM-side in test_scale):
        inserting then testing the same key can never miss, for ANY
        key set — the safety property the join prefilter rests on."""
        num_bits, k = 1 << 12, 5
        words = [0] * (num_bits // 64)

        import hashlib

        def xx(key, seed):
            # stand-in 64-bit hash with the same signed/modular shape
            h = int.from_bytes(
                hashlib.blake2b(f"{seed}:{key}".encode(), digest_size=8).digest(),
                "big", signed=True)
            return h

        def positions(key):
            return [xx(key, s) % num_bits for s in range(k)]

        for key in keys:
            for p in positions(key):
                words[p // 64] |= 1 << (p % 64)
        for key in keys:
            assert all(
                (words[p // 64] >> (p % 64)) & 1 for p in positions(key))


class TestBpeProperties:
    @given(st.lists(
        st.tuples(st.text(alphabet="abcdef", min_size=1, max_size=8),
                  st.integers(min_value=1, max_value=50)),
        min_size=1, max_size=30))
    @settings(max_examples=30, deadline=None)
    def test_encode_roundtrip_and_determinism(self, counts):
        """For ANY word-frequency table: learned merges are invariant
        to input order, and encoding any trained word concatenates
        back losslessly — BPE never drops or invents characters."""
        from crawler_spark.operators.bpe import (
            END_OF_WORD, encode_word, learn_merges,
        )

        # collapse duplicate words (Counter semantics of a groupBy)
        merged: dict[str, int] = {}
        for w, n in counts:
            merged[w] = merged.get(w, 0) + n
        table = sorted(merged.items())
        m1 = learn_merges(table, 30)
        m2 = learn_merges(list(reversed(table)), 30)
        assert m1 == m2
        ranks = {p: i for i, p in enumerate(m1)}
        for w, _ in table:
            assert "".join(encode_word(w, ranks)) == w + END_OF_WORD

    @given(st.text(alphabet="abcdef", min_size=1, max_size=12))
    @settings(max_examples=50, deadline=None)
    def test_unseen_words_encode_losslessly(self, word):
        from crawler_spark.operators.bpe import (
            END_OF_WORD, encode_word, learn_merges,
        )

        merges = learn_merges(
            [("abac", 5), ("bade", 3), ("face", 7)], 20)
        ranks = {p: i for i, p in enumerate(merges)}
        assert "".join(encode_word(word, ranks)) == word + END_OF_WORD


class TestBindOnce:
    """text.bind_once(arr, fn) must be a pure let-binding: same value
    as inlining fn(arr), for any element type fn returns, including
    NULL input arrays (HOF lambdas would otherwise re-evaluate the
    captured expression per reference — the O(n²) tokenizer trap)."""

    def test_value_and_null_semantics(self, spark):
        from pyspark.sql import functions as F

        from crawler_spark.functions.text import bind_once

        df = spark.createDataFrame(
            [("a b a",), (None,), ("",)], "text string")
        from crawler_spark.functions.text import tokenize

        out = df.select(
            # non-boolean return type (int)
            bind_once(tokenize("text"),
                      lambda arr: F.size(arr) * 2).alias("n2"),
            # boolean return type
            bind_once(tokenize("text"),
                      lambda arr: F.array_contains(arr, "b")).alias("has_b"),
            # array return type, referencing the bound var twice
            bind_once(tokenize("text"),
                      lambda arr: F.concat(arr, arr)).alias("dbl"),
        ).collect()
        assert [r["n2"] for r in out] == [6, None, 0]
        assert [r["has_b"] for r in out] == [True, None, False]
        assert out[0]["dbl"] == ["a", "b", "a", "a", "b", "a"]
        assert out[1]["dbl"] is None
        assert out[2]["dbl"] == []

    def test_matches_unbound_form(self, spark):
        from pyspark.sql import functions as F

        from crawler_spark.functions.text import bind_once, tokenize

        df = spark.createDataFrame(
            [("x y z y",), ("q",)], "text string")
        toks = tokenize("text")
        unbound = df.select(
            F.size(F.array_distinct(toks)).alias("u")).collect()
        bound = df.select(
            bind_once(toks, lambda a: F.size(F.array_distinct(a)))
            .alias("b")).collect()
        assert [r["u"] for r in unbound] == [r["b"] for r in bound]


class TestMergeByKeyInterleavings:
    """Companion to TestMergeByKeyModel (above): exact-row membership
    instead of uid-set membership, plus the recency_col=None
    priority-only path the model class doesn't exercise. 200
    independent scenarios ride ONE Spark job by folding the scenario
    id into the merge key."""

    def _scenarios(self, with_recency: bool):
        import random

        rng = random.Random(0xC0FFEE if with_recency else 0xBEEF)
        ex_rows, inc_rows, model = [], [], {}
        for s in range(200):
            per_key: dict[str, dict] = {}
            for side, bucket in (("e", "ex"), ("i", "inc")):
                for j in range(rng.randint(0, 4)):
                    k = f"{s}:{rng.randint(0, 3)}"
                    ts = rng.choice([None, 0, 1, 2, 2, 3]) if with_recency else None
                    row = (k, f"{side}{s}_{j}", ts)
                    (ex_rows if side == "e" else inc_rows).append(row)
                    per_key.setdefault(k, {"ex": [], "inc": []})[bucket].append(row)
            model.update({k: v for k, v in per_key.items()})
        return ex_rows, inc_rows, model

    def _check(self, got_rows, model, with_recency: bool):
        got = {r["k"]: r for r in got_rows}
        assert set(got) == set(model), "output keys != union of input keys"
        assert len(got_rows) == len(model), "must emit exactly one row per key"
        for k, sides in model.items():
            winner = got[k]
            # incoming beats existing unconditionally (ON CONFLICT DO
            # UPDATE), even when an existing row has a later timestamp
            pool = sides["inc"] or sides["ex"]
            pairs = {(p, t) for _, p, t in pool}
            assert (winner["payload"], winner["ts"]) in pairs, (
                f"{k}: winner not an exact row from the winning side")
            if with_recency:
                non_null = [t for _, _, t in pool if t is not None]
                if non_null:
                    assert winner["ts"] == max(non_null), (
                        f"{k}: winner must carry the max non-null recency")

    def _run(self, spark, with_recency: bool):
        from crawler_spark.operators.upsert import merge_by_key

        ex_rows, inc_rows, model = self._scenarios(with_recency)
        schema = "k string, payload string, ts int"
        ex = spark.createDataFrame(ex_rows, schema)
        inc = spark.createDataFrame(inc_rows, schema)
        got = merge_by_key(
            ex, inc, key="k",
            recency_col="ts" if with_recency else None).collect()
        self._check(got, model, with_recency)

    def test_recency_tiebreak_interleavings(self, spark):
        self._run(spark, with_recency=True)

    def test_priority_only_interleavings(self, spark):
        self._run(spark, with_recency=False)


def test_bloom_prefiltered_join_rejects_outer_joins(spark):
    """The Bloom prefilter deletes non-matching fact rows, so any
    outer/anti `how` would return wrong answers — rejected loudly."""
    import pytest as _pytest

    from crawler_spark.operators.bloom import bloom_prefiltered_join

    fact = spark.createDataFrame([(1, "a")], "k long, x string")
    dim = spark.createDataFrame([(1, "d")], "j long, y string")
    with _pytest.raises(ValueError):
        bloom_prefiltered_join(fact, dim, "k", "j", how="left")
    assert bloom_prefiltered_join(fact, dim, "k", "j").count() == 1


def test_kmv_sketch_null_users_and_small_types(spark):
    """KMV edge semantics the sf testdata can't exercise: a type whose
    user_ids are ALL NULL still emits a (type, empty-sketch) row (the
    oracle's GROUP BY keeps it; a pre-rank NULL filter dropped it),
    and NULLs never consume a bottom-k slot a real hash could hold."""
    from crawler_spark.plans.queries_events import _KMV_K, kmv_sketches

    rows = (
        [("nulls_only", None)] * 3
        + [("mixed", None)]
        + [("mixed", i) for i in range(5)]
        + [("big", i) for i in range(_KMV_K + 50)]
    )
    ev = spark.createDataFrame(rows, "event_type string, user_id long")
    got = {r.event_type: list(r.kmv) for r in kmv_sketches(ev).collect()}
    assert set(got) == {"nulls_only", "mixed", "big"}
    assert got["nulls_only"] == []
    assert len(got["mixed"]) == 5          # NULL took no slot
    assert len(got["big"]) == _KMV_K       # capped at k
    assert got["big"] == sorted(got["big"])


class TestEqualFrequencyCuts:
    """Invariants of the z-order layout's deterministic bucket-boundary
    derivation (operators/layout.py:equal_frequency_cuts) for ANY
    histogram — the pure half of the round-10 write_zordered rewrite."""

    hists = st.lists(
        st.tuples(st.integers(min_value=0, max_value=4095),
                  st.integers(min_value=1, max_value=10_000)),
        min_size=1, max_size=200,
        unique_by=lambda t: t[0],
    )
    n_buckets = st.integers(min_value=1, max_value=32)

    @given(hists, n_buckets)
    @settings(max_examples=200, deadline=None)
    def test_shape_and_monotonicity(self, hist, n):
        from crawler_spark.operators.layout import equal_frequency_cuts

        cuts = equal_frequency_cuts(hist, n)
        cells = {c for c, _ in hist}
        assert len(cuts) <= n - 1 if n > 1 else cuts == []
        assert cuts == sorted(cuts)
        assert all(c in cells for c in cuts)
        # permutation-insensitive (the Spark collect order is arbitrary)
        assert cuts == equal_frequency_cuts(list(reversed(hist)), n)

    @given(hists, n_buckets)
    @settings(max_examples=200, deadline=None)
    def test_bucket_mass_within_cell_granularity(self, hist, n):
        """Each bucket's mass ≤ ideal share + its boundary cell's count
        (a cell is never split), and every row lands in some bucket."""
        from crawler_spark.operators.layout import equal_frequency_cuts

        cuts = equal_frequency_cuts(hist, n)
        total = sum(cnt for _, cnt in hist)
        bounds = cuts + [4096]  # open last bucket
        masses = [0] * len(bounds)
        cell_count = dict(hist)
        for c, cnt in hist:
            b = next(i for i, hi in enumerate(bounds) if c <= hi)
            masses[b] += cnt
        assert sum(masses) == total
        ideal = total / n
        for i, m in enumerate(masses[:-1]):
            boundary = cell_count.get(bounds[i], 0)
            assert m <= ideal + boundary, (i, m, ideal, boundary)
