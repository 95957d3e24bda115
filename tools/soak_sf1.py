"""One-decade scale soak (verdict r10 item 3): measure the
scale-critical tiers at sf1.0 — 10× the bench corpus — and compare
each query against its linearly-scaled sf0.1 expectation, so the
100-TB plan-shape arguments in SCALING.md gain an empirical
order-of-magnitude datapoint. Writes SOAK_SF1.json.

The sf1 corpus is DERIVED from the driver's read-only sf0.1 tables
(never regenerated from scratch — TESTDATA.md): 10 deterministic
per-copy transformations unioned, written to /tmp as a multi-file
parquet layout so scans actually split:

* documents — doc_id offset per copy; text passed through a per-copy
  substitution cipher (translate over a 10-letter ring), so copies are
  NOT near-duplicates of each other and the dedup tiers see a corpus
  with the same duplicate STRUCTURE ×10, not a degenerate 10-dup blob.
* embeddings — vec_id offset; per-copy deterministic additive
  perturbation (sin of the component, copy-scaled) so no two copies
  collapse to the same point under cosine.
* events — event_id/user_id offset per copy (sessions keep their
  original lengths; user cardinality grows ×10, the realistic shape).

The graph tier has no sf-scaled fixture, so it soaks the OPERATORS
directly on a generated 10⁷-edge uniform-hash graph (≥ the verdict's
bar), fixed 5 iterations each.

Usage: python tools/soak_sf1.py [--copies 10] [--rebuild]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SRC_SF = "/root/testdata/sf0.1"
SF1_DIR = "/tmp/sf1_soak_corpus"
OUT = os.path.join(REPO, "SOAK_SF1.json")

# the scale-critical tiers the round-10 verdict named, plus this
# round's streaming deployment; every name is a registry query run
# verbatim at the sf1 dir
SOAK_QUERIES = [
    # dedup family
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs",
    "dedup_semantic", "dedup_repeated_spans",
    "dedup_ngram_jaccard_capped", "dedup_canonical_capped",
    # ANN build + serve
    "ivfpq_index_build", "knn_probe_ivfpq", "knn_topk_ivf",
    "knn_topk_ivf_refined", "o3_knn_topk_lsh", "knn_topk_batch_ivf",
    # sketches over the 1M-row events table
    "ev_quantile_merge_rollup", "ev_kmv_distinct_intersect",
    # corpus text tiers
    "tok_bpe_train", "curation_funnel",
    # distill → deploy, batch and streaming
    "curation_distilled_filter", "streaming_distilled_filter_e2e",
    # heaviest e2e pipelines (warc fixture scales with documents)
    "pipeline_warc_corpus_e2e", "streaming_warc_ingest_e2e",
]

GRAPH_EDGES = 10_000_000
GRAPH_NODES = 2_000_000
GRAPH_ITERS = 5


def build_sf1(spark, copies: int = 10, rebuild: bool = False) -> None:
    from pyspark.sql import functions as F

    from crawler_spark.sources import load_table

    marker = os.path.join(SF1_DIR, "_SOAK_BUILT")
    # the marker records the copies count: a re-run with a different
    # --copies must rebuild, or the recorded "copies" field would
    # misdocument the corpus the ratios were measured against
    if not rebuild and os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == f"copies={copies}":
                print(f"sf1 corpus already built at {SF1_DIR}", flush=True)
                return
    os.makedirs(SF1_DIR, exist_ok=True)

    ring = "abcdefghij"

    def doc_copy(df, i):
        rot = ring[i:] + ring[:i]
        return df.select(
            (F.col("doc_id") + i * 10**9).alias("doc_id"),
            F.translate("text", ring, rot).alias("text"),
            "lang", "source", "n_chars",
        )

    def emb_copy(df, i):
        return df.select(
            (F.col("vec_id") + i * 10**9).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: (x + 0.01 * i * F.sin(x * (37.0 + i))).cast("float"),
            ).alias("embedding"),
            "label",
        )

    def ev_copy(df, i):
        return df.select(
            (F.col("event_id") + i * 10**12).alias("event_id"),
            "ts",
            (F.col("user_id") + i * 10**9).alias("user_id"),
            "event_type", "value", "props",
        )

    for name, make in [("documents", doc_copy), ("embeddings", emb_copy),
                       ("events", ev_copy)]:
        base = load_table(spark, SRC_SF, name)
        out = make(base, 0)
        for i in range(1, copies):
            out = out.unionByName(make(base, i))
        path = os.path.join(SF1_DIR, f"{name}.parquet")
        out.repartition(32).write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        print(f"built {name}: {n} rows -> {path}", flush=True)
    with open(marker, "w") as fh:
        fh.write(f"copies={copies}\n")


DOCS_X100_DIR = "/tmp/sf10_soak_docs"
OUT_X100 = os.path.join(REPO, "SOAK_SF10_DOCS.json")

# documents-only tiers for the second decade (500k docs = 100x sf0.1):
# everything here reads ONLY the documents table
DOC_QUERIES = [
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs",
    "dedup_repeated_spans", "dedup_ngram_jaccard_capped",
    "tok_bpe_train", "curation_funnel", "curation_distilled_filter",
    "txt_quality_score", "txt_line_dedup",
]

# second decade for the OTHER two tables: 200k vectors / 10M events
# NOTE: dedup_semantic is soaked through the OPERATOR with its cluster
# count scaled (see soak_semdedup_x100), not the registered query: the
# query pins the bench corpus's centroid count, and SemDeDup's
# per-cluster exact gram is quadratic in CLUSTER SIZE by design — the
# documented at-scale recipe is C ∝ corpus (cluster size bounded), the
# same knob FAISS sizes by.
VEC_X100_QUERIES = [
    "ivfpq_index_build", "knn_probe_ivfpq", "knn_topk_ivf",
    "o3_knn_topk_lsh", "o3_knn_topk_sq8", "knn_topk_batch_ivf",
    "o3_knn_topk",
]
EV_X100_QUERIES = [
    "ev_quantile_merge_rollup", "ev_kmv_distinct_intersect",
    "ev_hll_distinct_rollup", "ev_daily_funnel", "ev_weekly_retention",
    "ev_value_percentiles_approx",
]


def build_vec_ev_x100(spark, rebuild: bool = False) -> None:
    """×100 embeddings + events into the SAME corpus dir as the ×100
    documents, reusing build_sf1's per-copy perturbations with 100
    copies (sin-perturbed vectors stay pairwise distinct because the
    additive term varies with both component value and copy index)."""
    from pyspark.sql import functions as F

    from crawler_spark.sources import load_table

    marker = os.path.join(DOCS_X100_DIR, "_SOAK_BUILT_VEC_EV")
    if os.path.exists(marker) and not rebuild:
        print("x100 embeddings/events already built", flush=True)
        return

    def emb_copy(df, i):
        return df.select(
            (F.col("vec_id") + i * 10**9).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: (x + 0.01 * i * F.sin(x * (37.0 + i))).cast("float"),
            ).alias("embedding"),
            "label",
        )

    def ev_copy(df, i):
        return df.select(
            (F.col("event_id") + i * 10**12).alias("event_id"),
            "ts",
            (F.col("user_id") + i * 10**9).alias("user_id"),
            "event_type", "value", "props",
        )

    for name, make in [("embeddings", emb_copy), ("events", ev_copy)]:
        base = load_table(spark, SRC_SF, name)
        out = make(base, 0)
        for i in range(1, 100):
            out = out.unionByName(make(base, i))
        path = os.path.join(DOCS_X100_DIR, f"{name}.parquet")
        out.repartition(64).write.mode("overwrite").parquet(path)
        print(f"built {name} x100: {spark.read.parquet(path).count()} rows",
              flush=True)
    with open(marker, "w") as fh:
        fh.write("ok\n")


def build_docs_x100(spark, rebuild: bool = False) -> None:
    """×100 documents corpus: two composed 10-letter substitution rings
    give 100 DISTINCT ciphers, so no two copies are exact or near
    duplicates of each other — duplicate structure scales with the
    corpus instead of degenerating into 100-dup families."""
    from pyspark.sql import functions as F

    from crawler_spark.sources import load_table

    marker = os.path.join(DOCS_X100_DIR, "_SOAK_BUILT")
    if os.path.exists(marker) and not rebuild:
        print(f"x100 docs corpus already built at {DOCS_X100_DIR}", flush=True)
        return
    os.makedirs(DOCS_X100_DIR, exist_ok=True)
    r1, r2 = "abcdefghij", "klmnopqrst"
    base = load_table(spark, SRC_SF, "documents")
    parts = []
    for i in range(100):
        a, b = i % 10, i // 10
        rot = (r1[a:] + r1[:a]) + (r2[b:] + r2[:b])
        parts.append(base.select(
            (F.col("doc_id") + i * 10**9).alias("doc_id"),
            F.translate("text", r1 + r2, rot).alias("text"),
            "lang", "source", "n_chars",
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    path = os.path.join(DOCS_X100_DIR, "documents.parquet")
    out.repartition(64).write.mode("overwrite").parquet(path)
    print(f"built documents x100: {spark.read.parquet(path).count()} rows",
          flush=True)
    with open(marker, "w") as fh:
        fh.write("ok\n")


def soak_semdedup_x100(spark) -> dict:
    """SemDeDup at ×100 with the cluster-count knob scaled the way the
    operator's docstring prescribes (C ∝ corpus, cluster size bounded
    ~n·n_assign/C): 160 centroids over 200k vectors keeps per-cluster
    grams the same size as the bench corpus's 16-over-20k."""
    from crawler_spark.operators.similarity import (
        semantic_dedup_keep,
        train_ivf_centroids,
    )
    from crawler_spark.sources import load_table

    emb = load_table(spark, DOCS_X100_DIR, "embeddings")
    t0 = time.perf_counter()
    cents = train_ivf_centroids(emb, n_centroids=160)
    keep = semantic_dedup_keep(emb, cents, threshold=0.95)
    keep.write.format("noop").mode("overwrite").save()
    return {"semdedup_x100_c160": {
        "sf10_sec": round(time.perf_counter() - t0, 3),
        "sf01_sec": None, "ratio_vs_100x": None, "err": None,
        "note": "operator run, C scaled 16->160 per the at-scale recipe",
    }}


def run_decade2(spark, registry) -> None:
    build_docs_x100(spark)
    build_vec_ev_x100(spark)
    bench_path = os.path.join(REPO, "BENCH_FULL.json")
    sf01 = json.load(open(bench_path))["queries"] if os.path.exists(bench_path) else {}
    results = {}
    for name in DOC_QUERIES + VEC_X100_QUERIES + EV_X100_QUERIES:
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        try:
            fn(spark, DOCS_X100_DIR).write.format("noop").mode("overwrite").save()
            sec = round(time.perf_counter() - t0, 3)
            err = None
        except Exception as exc:
            sec, err = -1.0, f"{type(exc).__name__}: {exc}"
        base = sf01.get(name)
        entry = {"sf10_sec": sec, "sf01_sec": base,
                 "ratio_vs_100x": (round(sec / (100 * base), 3)
                                   if base and sec > 0 else None),
                 "err": err}
        results[name] = entry
        print(f"{name}: sf10 {sec}s vs sf0.1 {base}s "
              f"(ratio vs linear 100x: {entry['ratio_vs_100x']})", flush=True)
    results.update(soak_semdedup_x100(spark))
    payload = {"sf": 10.0, "copies": 100, "built_from": SRC_SF,
               "tables": ["documents", "embeddings", "events"],
               "queries": results}
    with open(OUT_X100, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(f"wrote {OUT_X100}")


def soak_graph(spark) -> dict:
    """PageRank + PPR on a generated 10M-edge graph, fixed rounds."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.graph import pagerank, personalized_pagerank

    edges = (
        spark.range(GRAPH_EDGES)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(GRAPH_NODES)).alias("src"),
            F.pmod(F.xxhash64(F.col("id") + 7_777_777), F.lit(GRAPH_NODES))
            .alias("dst"),
        )
        .localCheckpoint(eager=True)
    )
    out: dict[str, float] = {}
    t0 = time.perf_counter()
    pagerank(edges, iterations=GRAPH_ITERS, tol=0.0).write.format(
        "noop").mode("overwrite").save()
    out[f"graph_pagerank_{GRAPH_EDGES//10**6}Medges_{GRAPH_ITERS}it"] = round(
        time.perf_counter() - t0, 3)
    seeds = spark.range(100).select((F.col("id") * 1000).alias("id"))
    t0 = time.perf_counter()
    personalized_pagerank(edges, seeds, iterations=GRAPH_ITERS, tol=0.0).write.format(
        "noop").mode("overwrite").save()
    out[f"graph_ppr_{GRAPH_EDGES//10**6}Medges_{GRAPH_ITERS}it"] = round(
        time.perf_counter() - t0, 3)
    return out


def main() -> None:
    copies = 10
    rebuild = "--rebuild" in sys.argv
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])

    from crawler_spark.plans import registry
    from crawler_spark.session import get_spark

    spark = get_spark("soak-sf1", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    if "--decade2" in sys.argv:  # ×100 documents-only second decade
        run_decade2(spark, registry)
        return

    build_sf1(spark, copies=copies, rebuild=rebuild)

    bench_path = os.path.join(REPO, "BENCH_FULL.json")
    sf01 = json.load(open(bench_path))["queries"] if os.path.exists(bench_path) else {}

    results: dict[str, dict] = {}
    for name in SOAK_QUERIES:
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        try:
            fn(spark, SF1_DIR).write.format("noop").mode("overwrite").save()
            sec = round(time.perf_counter() - t0, 3)
            err = None
        except Exception as exc:
            sec, err = -1.0, f"{type(exc).__name__}: {exc}"
        base = sf01.get(name)
        entry = {"sf1_sec": sec, "sf01_sec": base,
                 "ratio_vs_10x": (round(sec / (10 * base), 2)
                                  if base and sec > 0 else None),
                 "err": err}
        results[name] = entry
        print(f"{name}: sf1 {sec}s vs sf0.1 {base}s "
              f"(ratio vs linear 10x: {entry['ratio_vs_10x']})", flush=True)

    results.update({k: {"sf1_sec": v, "sf01_sec": None,
                        "ratio_vs_10x": None, "err": None}
                    for k, v in soak_graph(spark).items()})

    payload = {"sf": 1.0, "copies": copies, "built_from": SRC_SF,
               "queries": results}
    with open(OUT, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
