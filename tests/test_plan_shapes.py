"""Physical-plan regression tests: the plans we audited and want to
KEEP (.explain('formatted') invariants). A future edit that silently
turns a broadcast join into a sort-merge join, drops a pushed filter,
or widens a pruned scan fails here, not in a 100 TB incident."""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

_QUERIES = E.queries()


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", ["q3_shipping_priority", "q5_regional_revenue",
                                  "q18_large_volume", "q8_market_share"])
def test_dimension_joins_broadcast(spark, name):
    plan = plan_text(_QUERIES[name](spark, SF))
    assert "BroadcastHashJoin" in plan, f"{name}: dimension join not broadcast"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product leaked in"


@pytest.mark.parametrize("name", ["o1_sort_paginate", "o3_knn_topk",
                                  "web_pages_listing", "q3_shipping_priority"])
def test_topk_is_take_ordered(spark, name):
    plan = plan_text(_QUERIES[name](spark, SF))
    assert "TakeOrderedAndProject" in plan, (
        f"{name}: sort+limit did not collapse to TakeOrderedAndProject"
    )


def test_projected_scan_prunes_columns(spark):
    plan = plan_text(_QUERIES["s1_scan_projected"](spark, SF))
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "text" not in read[0], (
        "s1 projects 4 columns but the scan still reads `text`"
    )


def test_fts_grammar_prunes_columns_no_shuffle(spark):
    """p4_fts_grammar is a filter+project: the scan must read only the
    three needed columns (lang/n_chars pruned) and the plan must have
    no Exchange — the tsquery expression is a per-row predicate."""
    plan = plan_text(_QUERIES["p4_fts_grammar"](spark, SF))
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "lang" not in read[0] and "n_chars" not in read[0], (
        "grammar filter widened the documents scan"
    )
    assert "Exchange" not in plan, "per-row FTS predicate introduced a shuffle"


def test_knn_filtered_pushdown_and_topk(spark):
    """o3_knn_filtered (pre-filter arm): the label predicate must push
    to the embeddings parquet scan and the sort+limit must collapse to
    TakeOrderedAndProject — filtered vector search costs a pruned scan
    plus a per-partition top-k, never a full sort."""
    plan = plan_text(_QUERIES["o3_knn_filtered"](spark, SF))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "EqualTo(label,3)" in pushed[0], (
        "label predicate did not push to the scan")
    assert "TakeOrderedAndProject" in plan


def test_quantile_rollup_two_shuffles_pruned_scan(spark):
    """ev_quantile_merge_rollup: exactly the day-shuffle and the final
    single-partition merge — a third Exchange would mean the sketch
    stopped being a two-level partial aggregate; scan reads only
    (ts, event_id, value)."""
    import re

    plan = plan_text(_QUERIES["ev_quantile_merge_rollup"](spark, SF))
    n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_ex <= 2, f"expected <=2 shuffles, saw {n_ex}"
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "event_type" not in read[0] and "props" not in read[0], (
        "quantile sketch widened the events scan")


def test_filter_pushed_to_scan(spark):
    plan = plan_text(_QUERIES["p1_filter_eq"](spark, SF))
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("EqualTo" in ln for ln in pushed), (
        "equality predicate not pushed into the parquet scan"
    )


def test_cosine_pairs_never_broadcasts_packed_blocks(spark):
    """Regression lock on the r2 advice fix: the exact all-pairs plan
    must move the packed matrix blocks through the executor shuffle
    (explode → groupBy on the pair key), NEVER through a driver
    broadcast — a broadcast of the packed table reintroduces the
    driver-memory / 8 GB broadcast ceiling at scale."""
    plan = plan_text(_QUERIES["simsearch_cosine_pairs"](spark, SF))
    assert "BroadcastExchange" not in plan, (
        "cosine_pairs_exact broadcasts its packed blocks again"
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_precomputed_ann_probe_prunes_partitions(spark):
    """The ANN serving path must hit only the query's band/bucket
    directories: partition filters on both partition columns."""
    from crawler_spark.plans.queries_vector import knn_probe_precomputed

    plan = plan_text(knn_probe_precomputed(spark, SF))
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "band" in pf[0] and "bucket" in pf[0], (
        "probe scans the whole index instead of pruning partitions"
    )


def test_no_cartesian_anywhere_in_relational_core(spark):
    """Every TPC-H-ish adaptation must be free of cartesian products
    (the q11 scalar-total crossJoin broadcasts a 1-row side, which
    Spark plans as BroadcastNestedLoopJoin — bounded, allowed)."""
    for name in [q for q in _QUERIES if q.startswith("q")]:
        plan = plan_text(_QUERIES[name](spark, SF))
        assert "CartesianProduct" not in plan, f"{name} contains CartesianProduct"


def test_ngram_pairs_single_shuffle_no_join(spark):
    """Regression lock on the pack-explode rewrite: exact n-gram pair
    generation must emit in-group pairs from ONE groupBy(shingle-hash)
    pack — no self-join node (SortMergeJoin/ShuffledHashJoin) may
    reappear between the shingle scan and the pair count."""
    plan = plan_text(_QUERIES["dedup_ngram_jaccard"](spark, SF))
    assert "SortMergeJoin" not in plan, (
        "exact n-gram pairs regressed to a shingle self-join"
    )
    assert plan.count("ShuffledHashJoin") == 0


def test_repetition_ratio_zero_shuffle(spark):
    """txt_repetition_ratio's whole statistic is a per-row array
    projection — the plan must contain NO exchange and NO aggregate:
    it runs at scan speed. An explode→groupBy rewrite (corpus-sized
    shuffle for a per-row number) fails here."""
    plan = plan_text(_QUERIES["txt_repetition_ratio"](spark, SF))
    assert "Exchange" not in plan, "repetition ratio acquired a shuffle"
    assert "HashAggregate" not in plan, "repetition ratio acquired an aggregate"


def test_url_blocklist_zero_shuffle(spark):
    """curation_url_blocklist is a per-row suffix-set membership test
    against a broadcast-literal list — NO exchange, NO join, NO
    aggregate: it must run at scan speed (the explode+semi-join form
    is the documented big-list path, not this plan)."""
    plan = plan_text(_QUERIES["curation_url_blocklist"](spark, SF))
    assert "Exchange" not in plan, "blocklist filter acquired a shuffle"
    assert "Join" not in plan, "blocklist filter acquired a join"


def test_url_blocklist_big_is_broadcast_equi_semi(spark):
    """curation_url_blocklist_big takes the large-list arm: suffix-set
    explode + broadcast LEFT SEMI on EQUALITY + LEFT ANTI back on
    doc_id. A LIKE-based rewrite degenerates to a nested-loop join
    over 10⁵ entries × every row — locked out here."""
    plan = plan_text(_QUERIES["curation_url_blocklist_big"](spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, (
        "big blocklist arm is not a broadcast equi semi-join"
    )
    assert "LeftAnti" in plan, "doc_id anti-join missing"
    assert "BroadcastNestedLoopJoin" not in plan, (
        "big blocklist arm regressed to a nested-loop (LIKE?) join"
    )
    assert "CartesianProduct" not in plan


def test_line_dedup_two_shuffles(spark):
    """txt_line_dedup is posexplode → map-side-combined line count →
    broadcast ANTI join of the tiny over-threshold drop-set → doc
    regroup: at most TWO shuffle exchanges (line, doc_id), the
    drop-set join MUST be BroadcastHashJoin LeftAnti, and there must
    be NO WindowExec partitioned by line — a window count gets no
    partial aggregation, so the hottest boilerplate line (the very
    thing being removed) lands on one task at 100 TB."""
    import re

    plan = plan_text(_QUERIES["txt_line_dedup"](spark, SF))
    n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_ex <= 2, f"line dedup acquired extra shuffles ({n_ex})"
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, (
        "drop-set join is not a broadcast anti join"
    )
    assert not re.search(r"^\(\d+\) Window", plan, re.M), (
        "line frequency regressed to a WindowExec (skewed-key window)"
    )


def test_incremental_dedup_broadcasts_batch_grams(spark):
    """dedup_incremental joins corpus grams against BATCH grams — the
    small new-crawl side must broadcast so the corpus streams map-side
    through the join; a shuffle join on the raw gram stream moves the
    whole corpus token stream through an exchange."""
    plan = plan_text(_QUERIES["dedup_incremental"](spark, SF))
    assert "BroadcastHashJoin" in plan, (
        "batch gram join is no longer broadcast"
    )


def test_export_pipeline_two_hash_shuffles(spark):
    """corpus_export_pipeline = dedup window + shard-pack window: its
    plan must carry exactly the two hashpartitioning exchanges those
    windows need (fingerprint, shard_id) — a third exchange means a
    stage stopped composing pipeline-style."""
    plan = plan_text(_QUERIES["corpus_export_pipeline"](spark, SF))
    n = plan.count("Arguments: hashpartitioning")
    assert n == 2, f"expected 2 hash exchanges, found {n}"
    # bonus Catalyst win worth locking: the rn=1 dedup filter pushes
    # down as a partial WindowGroupLimit, so each map task keeps only
    # its local best row per fingerprint BEFORE the shuffle
    assert "WindowGroupLimit" in plan, "rn=1 no longer pushes down"


@pytest.mark.parametrize("name", ["doc_chunks", "txt_pii_redact",
                                  "txt_gopher_rules"])
def test_ragprep_projections_zero_shuffle(spark, name):
    """Chunking, PII redaction, and the Gopher gates are pure per-row
    projections — the plan must contain NO exchange and NO aggregate:
    they run at scan speed and scale embarrassingly."""
    plan = plan_text(_QUERIES[name](spark, SF))
    assert "Exchange" not in plan, f"{name} acquired a shuffle"
    assert "HashAggregate" not in plan, f"{name} acquired an aggregate"


def test_inverted_index_two_token_shuffles(spark):
    """inverted_index_postings: exactly TWO hashpartitioning(token)
    exchanges — the df groupBy (map-side-combined, skew-immune) and
    the rank-capped window (WindowGroupLimit-bounded). The old
    single-exchange form computed df as count OVER the token window,
    which buffered the full "the"-class partition in one task AND
    blocked the rank pushdown; one extra bounded exchange buys skew
    immunity on a Zipfian key. A third exchange would mean the final
    join or the postings groupBy stopped reusing the token
    partitioning."""
    plan = plan_text(_QUERIES["inverted_index_postings"](spark, SF))
    n = plan.count("Arguments: hashpartitioning")
    assert n == 2, f"expected exactly 2 hash exchanges on token, found {n}"


def test_ngram_pairs_reuse_shingle_exchange(spark):
    """The sizes branch must derive from the SAME hashpartitioning(g)
    exchange as the pair branch (runtime ReusedExchange under AQE) —
    a regression to a second grams scan re-runs the expensive
    tokenize→shingle→hash projection over the whole corpus."""
    df = _QUERIES["dedup_ngram_jaccard"](spark, SF)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, (
        "shingle exchange no longer reused between sizes and pairs"
    )


def test_hybrid_rrf_bounded_candidates(spark):
    """search_hybrid_rrf: both retrievers must reach their candidate
    lists via TakeOrderedAndProject (bounded top-N, no corpus-wide
    global sort) and the fusion join must not go cartesian."""
    plan = plan_text(_QUERIES["search_hybrid_rrf"](spark, SF))
    assert plan.count("TakeOrderedAndProject") >= 2, (
        "a retriever lost its bounded top-N"
    )
    assert "CartesianProduct" not in plan


def test_span_overlap_no_nested_loop(spark):
    """ev_span_overlap: the interval overlap must stay an equi-join on
    (key, bucket) — BroadcastNestedLoop/Cartesian means the bucketed
    rewrite regressed to the naive inequality join."""
    plan = plan_text(_QUERIES["ev_span_overlap"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_trailing_features_single_user_shuffle(spark):
    plan = plan_text(_QUERIES["ev_trailing_features"](spark, SF))
    n = plan.count("Arguments: hashpartitioning")
    assert n == 1, f"expected 1 exchange on user_id, found {n}"


def test_batch_knn_partial_window_group_limit(spark):
    """knn_topk_batch: the rn<=k filter must rewrite into a PARTIAL
    WindowGroupLimit before the query_id exchange — each partition ships
    only its local top-k per query, never the corpus×Q cross join — and
    the Q-row query frame must broadcast."""
    plan = plan_text(_QUERIES["knn_topk_batch"](spark, SF))
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan, "map-side top-k (Partial WindowGroupLimit) lost"
    assert "BroadcastExchange" in plan


def test_approx_bins_no_sort_no_window(spark):
    """ev_value_bins_approx is the 100 TB binning path BECAUSE its plan
    has no Sort and no Window over the value column: cutpoints come from
    the mergeable approx_percentile sketch (partial agg → single merge)
    and assignment is a broadcast array expression."""
    import re

    plan = plan_text(_QUERIES["ev_value_bins_approx"](spark, SF))
    assert "approx_percentile" in plan
    assert "Window" not in plan
    assert re.search(r"\(\d+\) Sort\b", plan) is None, "Sort node leaked in"
    assert re.search(r"\bntile\(", plan) is None
    assert "BroadcastExchange" in plan, (
        "the 9-value cutpoint frame should broadcast, not shuffle"
    )


def test_bigram_lm_joins_broadcast(spark):
    """The probability join back to the gram stream must broadcast the
    vocab-bounded LM tables — a SortMergeJoin here re-shuffles the
    whole gram stream at corpus scale."""
    plan = plan_text(_QUERIES["txt_bigram_logprob"](spark, SF))
    assert "SortMergeJoin" not in plan, "LM table join fell back to SMJ"
    assert plan.count("BroadcastHashJoin") >= 2


def test_repeated_spans_skew_safe_shape(spark):
    """Span dedup is class-agg-then-reassemble: first occurrence via
    groupBy(span) struct-min (partial agg — the hottest span is the
    boilerplate block on every page) + join-back, NEVER a row_number
    window (no rank-filter pushdown exists because every span row
    needs a kept/dropped verdict, so a window buffers the whole hot
    class in one task). At most the four keyed exchanges (span
    classes, join-back probe, doc reassembly, + AQE reuse slack) and
    no cartesian/self-join on the span stream."""
    import re

    plan = plan_text(_QUERIES["dedup_repeated_spans"](spark, SF))
    assert not re.search(r"\) Window", plan), (
        "repeated-span first-occurrence regressed to a span window"
    )
    assert "CartesianProduct" not in plan
    n_exchanges = len(
        [ln for ln in plan.splitlines() if re.match(r"\(\d+\) Exchange", ln)])
    assert n_exchanges <= 4, n_exchanges


def test_ivfpq_probe_first_pass_reads_codes_not_floats(spark, tmp_path):
    """The materialized-index ADC pass must scan (id, codes) only —
    the float column appearing in the first-pass ReadSchema would
    erase the 32× bandwidth win the index exists for."""
    from crawler_spark.operators.similarity import (
        build_ivfpq_index,
        knn_topk_ivfpq_indexed,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from crawler_spark.plans.queries_vector import QUERY_VEC
    from crawler_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = train_ivf_centroids(emb, n_centroids=8, seed=42)
    books = train_pq_codebooks(emb, n_subspaces=8, n_codes=16, seed=42)
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, idx, cents, books)

    plan = plan_text(knn_topk_ivfpq_indexed(
        spark, idx, cents, books, QUERY_VEC, k=5, nprobe=2))
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert len(reads) >= 2
    codes_scans = [ln for ln in reads if "codes" in ln]
    assert codes_scans, "no codes-only scan found"
    assert all("v:array" not in ln for ln in codes_scans), (
        "ADC first pass reads the float column:\n" + "\n".join(codes_scans))


def test_bpe_word_count_is_bounded_take_ordered(spark):
    """BPE training's only corpus-scale op: word counts with map-side
    combine, capped by TakeOrderedAndProject — the driver transfer is
    top_v rows by plan, never the full vocabulary."""
    from crawler_spark.operators.bpe import word_counts
    from crawler_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    plan = plan_text(word_counts(docs, top_v=100))
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan, "word count lost map-side combine"


def test_cdc_chunking_has_no_shuffle(spark):
    """Content-defined chunking is pure array HOFs + posexplode —
    any Exchange appearing here is a regression."""
    plan = plan_text(_QUERIES["doc_chunks_cdc"](spark, SF))
    assert "Exchange" not in plan, "CDC chunking grew a shuffle"


def test_crossdoc_incremental_broadcasts_batch_grams(spark):
    """dedup_crossdoc_incremental streams corpus grams through a
    broadcast of the BATCH's positional grams (bounded by the crawl
    increment by construction) — a shuffle join here would exchange
    the whole corpus gram stream."""
    plan = plan_text(_QUERIES["dedup_crossdoc_incremental"](spark, SF))
    assert "BroadcastHashJoin" in plan, (
        "batch positional-gram join is no longer broadcast"
    )


def test_crossdoc_spans_no_cartesian_fine_keys(spark):
    """Both full span queries must stay equi-keyed end to end: no
    cartesian/broadcast-nested-loop anywhere (the gram join and the
    island merge are hash-keyed by construction)."""
    for name in ("dedup_crossdoc_spans", "dedup_crossdoc_removal"):
        plan = plan_text(_QUERIES[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_cooccurrence_projection_is_equi_join(spark):
    """The bucket self-join must key on the bucket columns (hash/sort
    join), never degrade to a cartesian + filter; and the triangle
    census's wedge-close join must be an equi-join on the endpoint
    pair."""
    for name in ("graph_cooccur_degree", "graph_triangle_stats"):
        plan = plan_text(_QUERIES[name](spark, SF))
        assert "CartesianProduct" not in plan, f"{name}: cartesian leak"
    # the degree path must not contain ANY nested-loop join; the census
    # is allowed exactly its scalar-combine crossJoins (1-row frames)
    plan = plan_text(_QUERIES["graph_cooccur_degree"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan, "nested-loop join leak"


def test_triangle_wedge_count_not_from_wedge_join(spark):
    """The clustering coefficient's wedge total comes from the degree
    frame (Σd(d-1)/2); the O(m^1.5) wedge materialization exists only
    under the triangle branch. Locked by checking the one-row output
    on a fixture where the counts differ wildly."""
    from crawler_spark.operators.graph import triangle_stats

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "u long, v long"  # pure star
    )
    row = triangle_stats(edges).collect()[0]
    assert row.n_wedges == 8 * 7 // 2  # hub wedges counted from degrees
    assert row.n_triangles == 0


def test_triangle_wedge_selfjoin_reuses_checkpoint_partitioning(spark):
    """Round-13 lock: the wedge self-join must consume the oriented
    edge checkpoint's OWN hashpartitioning(src)+ordering — no Exchange
    and no Sort between the two ExistingRDD scans and their
    SortMergeJoin (the r12 shape paid 2 Exchange + 2 Sort there). The
    checkpoint is materialized with AQE off precisely so the captured
    partitioning is not UnknownPartitioning; if this regresses, the
    join subtree grows Exchange/Sort nodes again."""
    import re

    from crawler_spark.operators.graph import triangle_stats

    edges = spark.createDataFrame(
        [(i, j) for i in range(12) for j in range(i + 1, 12)
         if (i + j) % 3 != 0],
        "u long, v long",
    )
    plan = plan_text(triangle_stats(edges))
    # the wedge join is the INNERMOST SMJ (both inputs are checkpoint
    # scans); between it and its two Scan ExistingRDD children at most
    # a partitioning-preserving isnotnull Filter may appear —
    # critically NO Exchange and NO Sort on either side
    ok = False
    for m in re.finditer(r"SortMergeJoin[^\n]*\n", plan):
        seg, scans = [], 0
        for line in plan[m.end():].splitlines():
            seg.append(line)
            if "Scan ExistingRDD" in line:
                scans += 1
                if scans == 2:
                    break
            elif not re.search(r"Filter \(\d+\)", line):
                break  # any non-Filter node between SMJ and its scans
        if scans == 2 and not any(
                re.search(r"Exchange|Sort \(", s) for s in seg):
            ok = True
            break
    assert ok, (
        "wedge self-join no longer reads the src-partitioned "
        "checkpoint directly:\n" + plan[:2000])


def test_bm25_one_scalar_agg_no_doc_join(spark):
    """search_bm25_topk: corpus stats come back via a BROADCAST nested
    loop over the 1-row aggregate (never a doc_id join), tf/dl from one
    projection per pass, and the ranking collapses to
    TakeOrderedAndProject — two scans (stats pass + scoring pass) and a
    scalar broadcast are the whole 100 TB cost."""
    plan = plan_text(_QUERIES["search_bm25_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan, (
        "corpus stats must broadcast as a 1-row frame"
    )
    assert "SortMergeJoin" not in plan
    # formatted explain lists each node twice (tree + detail section):
    # 4 occurrences = exactly 2 scans, the stats pass and the scoring
    # pass — a third would mean a lineage fork re-reading the corpus
    assert plan.count("Scan parquet") == 4, (
        "BM25 must read documents exactly twice (stats + scoring pass)"
    )


def test_hybrid_bm25_bounded_candidates(spark):
    """search_hybrid_bm25: both retriever arms produce their candidate
    lists via TakeOrderedAndProject (never a corpus-wide rank window),
    exactly 3 scans feed the fusion (BM25 scoring + BM25 stats +
    embeddings), and no cartesian product appears."""
    plan = plan_text(_QUERIES["search_hybrid_bm25"](spark, SF))
    assert plan.count("TakeOrderedAndProject") >= 4  # 2 arms + final, x2 detail
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") == 6, (
        "hybrid must read exactly 3 inputs (scoring, stats, embeddings)"
    )


def test_dpp_probe_fact_scan_dynamically_pruned(spark):
    """layout_dpp_probe: the dim filter is on a non-key column, so the
    ONLY way partition pruning reaches the fact scan is Spark's
    dynamic partition pruning — the fact FileScan must carry a
    dynamicpruning expression in its PartitionFilters."""
    plan = plan_text(_QUERIES["layout_dpp_probe"](spark, SF))
    assert "dynamicpruning" in plan.lower(), (
        "fact scan lost its DynamicPruningExpression — the 100 TB "
        "partitioned-fact join would scan every partition"
    )


def test_boilerplate_strip_zero_shuffle(spark):
    """txt_boilerplate_strip is a pure projection — any Exchange is a
    regression."""
    plan = plan_text(_QUERIES["txt_boilerplate_strip"](spark, SF))
    assert "Exchange" not in plan, "boilerplate strip acquired a shuffle"


def test_cluster_histogram_no_joins_no_python(spark):
    """dedup_cluster_histogram is explode + two groupBys: no joins of
    any kind and no Python evaluation may appear — both would signal
    the corpus-health card stopped being a pure aggregation pass."""
    plan = plan_text(_QUERIES["dedup_cluster_histogram"](spark, SF))
    import re

    assert "Join" not in plan, "histogram grew a join"
    assert "EvalPython" not in plan, "histogram fell off the JVM path"
    # formatted-explain lists each node twice (tree + detail) — count
    # distinct node ids
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 2, (
        f"histogram shuffles {n_exchanges}x, expected its two groupBys"
    )


def test_judge_calibration_classifier_side_jvm(spark):
    """curation_judge_calibration: the only Python in the plan must be
    the judge's Arrow UDF — the hashed-linear classifier side stays
    whole-stage JVM (its features/weights are pure expressions), and
    the doc_id join must not be a cartesian product."""
    import re

    plan = plan_text(_QUERIES["curation_judge_calibration"](spark, SF))
    assert "CartesianProduct" not in plan
    # exactly one Arrow-batched python node (the judge); the
    # classifier's md5 feature hashing shows up nowhere as Python.
    # formatted-explain lists each node twice — count distinct ids
    n_arrow = len(re.findall(r"\(\d+\) ArrowEvalPython", plan))
    assert n_arrow == 1, (
        f"expected exactly the judge UDF on the Python path, saw {n_arrow}"
    )
    assert "BatchEvalPython" not in plan, "row-at-a-time UDF leaked in"


def test_gopher_repetition_zero_shuffle(spark):
    """txt_gopher_repetition claims scan-speed: a pure projection over
    HOF gram arrays — no Exchange, no Python, no joins may appear."""
    import re

    plan = plan_text(_QUERIES["txt_gopher_repetition"](spark, SF))
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert not re.findall(r"\(\d+\) Exchange", plan), (
        "repetition metrics grew a shuffle"
    )


@pytest.mark.parametrize(
    "name", ["clf_distill_score", "curation_distilled_filter"]
)
def test_distill_score_single_shuffle_broadcast_model(spark, name):
    """clf_distill_score (holdout) and curation_distilled_filter (full
    corpus deployment) are explode → BroadcastHashJoin against the
    materialized ≤4097-row model → ONE map-side-combined per-doc agg
    (+ the output sort): at most TWO exchanges, no sort-merge join.
    A regression that re-instantiates the training DAG under each
    model branch shows up as extra exchanges/Generates — that plan
    runs the judge UDF projection ~4× per scoring job."""
    import re

    plan = plan_text(_QUERIES[name](spark, SF))
    n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    n_gen = len(re.findall(r"^\(\d+\) Generate", plan, re.M))
    assert n_ex <= 2, f"distill scoring acquired extra shuffles ({n_ex})"
    assert n_gen == 1, f"feature explode runs {n_gen}x"
    assert "BroadcastHashJoin" in plan, "model join is not broadcast"
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_distill_train_judges_once(spark):
    """nb_train labels N sample docs with the judge and must COST N
    judge calls: the class prior rides the same explode as the
    feature buckets (sentinel bucket = -1), so the AQE-final plan has
    exactly ONE ArrowEvalPython judge projection — a second one means
    a branch re-scans the unpersisted labeled frame and a production
    run pays 2N model calls (review-found regression shape)."""
    df = _QUERIES["clf_distill_train"](spark, SF)
    df.collect()  # AQE finalizes the plan (ReusedExchange visible)
    plan = plan_text(df)
    # count inside the FINAL plan tree only — formatted explain of a
    # finalized AdaptiveSparkPlan appends the pre-AQE "Initial Plan"
    # (where the duplicate is expected: reuse happens at runtime)
    final = plan.split("== Initial Plan ==")[0]
    n_udf = final.count("ArrowEvalPython")
    assert n_udf == 1, f"judge projection runs {n_udf}x per training job"
    assert "ReusedExchange" in final, (
        "consts branch no longer reuses the vocab exchange"
    )


@pytest.mark.parametrize("name", ["dedup_exact", "dedup_keep_best"])
def test_exact_dedup_no_fingerprint_window(spark, name):
    """Exact-dedup verdicts emit a row for EVERY doc, so the per-class
    aggregate must be a groupBy (partial agg collapses the hottest
    duplicate cluster map-side) joined back — never min/first OVER
    (PARTITION BY fp), which buffers the whole hot cluster in one
    WindowExec task and gets no WindowGroupLimit rescue because no
    rank filter exists. Joins get AQE skew-splitting; windows don't."""
    import re

    plan = plan_text(_QUERIES[name](spark, SF))
    assert not re.search(r"\) Window", plan), (
        f"{name}: fingerprint window is back (skewed-key window)"
    )
    assert "Join" in plan and "CartesianProduct" not in plan


@pytest.mark.parametrize("name", ["corpus_clean", "inverted_index_postings",
                                  "ev_kmv_distinct_intersect"])
def test_rank_filter_pushes_window_group_limit(spark, name):
    """First-per-fingerprint / first-cap-per-token / bottom-k-per-type
    selection must be a row_number + rank FILTER so Spark inserts
    WindowGroupLimit — a map-side per-key top-k that bounds what the
    hottest key ships into the window shuffle. The min()-compare /
    count-over / collect_set-then-slice forms don't qualify and buffer
    the full hot partition in one task."""
    plan = plan_text(_QUERIES[name](spark, SF))
    assert "WindowGroupLimit" in plan, (
        f"{name}: rank filter no longer pushes down as WindowGroupLimit"
    )




def test_streaming_semdedup_sink_broadcasts_and_prunes(spark):
    """The incremental-SemDeDup sink's scoring join must keep its
    audited shape: the (small) arriving batch BROADCASTS into the
    directory-pruned corpus-index scan — the probed list_ids appear as
    an INSET partition filter — and no sort-merge join or cartesian
    product sneaks in. Built here exactly as the foreachBatch body
    builds it (the registered query runs the stream; this locks the
    per-trigger plan the stream executes)."""
    import shutil

    from pyspark.sql import functions as F

    from crawler_spark.functions import vector as V
    from crawler_spark.operators.similarity import (
        build_ivf_index,
        top_centroids_udf,
    )
    from crawler_spark.plans.queries_vector import _ensure_ivf_centroids
    from crawler_spark.sources import load_table

    cents = _ensure_ivf_centroids(spark, SF)
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    idx = "/tmp/plan_shape_semdedup_idx"
    shutil.rmtree(idx, ignore_errors=True)
    build_ivf_index(emb.filter(F.col("vec_id") % 10 != 0), idx, cents)
    batch = emb.filter(F.col("vec_id") % 10 == 0).limit(20)
    probes = (
        batch.select("vec_id", V.l2_normalize("embedding").alias("vb"))
        .withColumn("list_id", F.explode(top_centroids_udf(cents, 2)("vb")))
    )
    lists = [r[0] for r in probes.select("list_id").distinct().collect()]
    corpus = (spark.read.parquet(idx)
              .filter(F.col("list_id").isin(lists))
              .select("list_id", F.col("v").alias("vc")))
    best = (
        corpus.join(F.broadcast(probes), "list_id")
        .groupBy("vec_id")
        .agg(F.max(V.dot(F.col("vb"), F.col("vc"))).alias("mx"))
    )
    plan = plan_text(best)
    assert "BroadcastHashJoin" in plan, "batch side not broadcast"
    assert "SortMergeJoin" not in plan, "scoring join fell back to SMJ"
    assert "CartesianProduct" not in plan
    assert "INSET" in plan or "isin" in plan, (
        "probed list_ids did not reach the corpus scan as a partition "
        "filter"
    )
    shutil.rmtree(idx, ignore_errors=True)
