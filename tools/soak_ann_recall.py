"""ANN recall at soak scale (verdict r11 item 7): the ×100 soak
measured the approximate tiers' SPEED at 200k vectors but not their
recall — this closes that gap. Recall@10 per tier, averaged over 20
deterministic query vectors drawn from the corpus, against the exact
cosine top-10 computed the same way, at the ×100 soak corpus
(/tmp/sf10_soak_docs — build with `python tools/soak_sf1.py --decade2`
first) with the knobs scaled the way SCALING.md prescribes: IVF gets
C = 160 (cluster size held ~constant, the FAISS sizing rule) probed at
the SAME fraction as the bench corpus (nprobe/C = 4/16 → 40/160); LSH
and SQ8 are scan-shaped and keep their registered knobs. Writes
SOAK_ANN_RECALL.json; the sf0.01 single-query floors the driver pins
(diag_ann_recall: ivf 0.7, lsh 0.4, sq8 1.0) are recorded alongside
for the comparison SCALING.md makes.

Usage: python tools/soak_ann_recall.py [--queries 20]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

CORPUS = "/tmp/sf10_soak_docs"
OUT = os.path.join(REPO, "SOAK_ANN_RECALL.json")
K = 10
FLOORS = {"ivf": 0.7, "lsh": 0.4, "sq8": 1.0}


def main() -> None:
    from concurrent.futures import ThreadPoolExecutor

    from crawler_spark.operators.similarity import (
        build_ivf_index,
        knn_topk,
        knn_topk_ivf,
        knn_topk_lsh,
        knn_topk_sq8,
        train_ivf_centroids,
    )
    from crawler_spark.session import get_spark
    from crawler_spark.sources import load_table

    n_queries = 20
    if "--queries" in sys.argv:
        n_queries = int(sys.argv[sys.argv.index("--queries") + 1])

    spark = get_spark(
        "soak-ann-recall", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, CORPUS, "embeddings").select(
        "vec_id", "embedding")
    n = emb.count()
    queries = [
        (int(r.vec_id), list(map(float, r.embedding)))
        for r in emb.orderBy("vec_id").limit(n_queries).collect()
    ]
    print(f"{n} vectors, {len(queries)} query vectors", flush=True)

    t0 = time.perf_counter()
    cents = train_ivf_centroids(emb, n_centroids=160)
    idx = os.path.join("/tmp", "soak_ann_recall_ivf_c160")
    if not os.path.isfile(os.path.join(idx, "_SUCCESS")):
        build_ivf_index(emb, idx, cents)
    build_sec = round(time.perf_counter() - t0, 3)

    def topk_ids(df) -> set[int]:
        return {r.vec_id for r in df.collect()}

    tiers = {
        "exact": lambda q: knn_topk(emb, q, k=K),
        "ivf": lambda q: knn_topk_ivf(spark, idx, cents, q, k=K, nprobe=40),
        "lsh": lambda q: knn_topk_lsh(emb, q, k=K),
        "sq8": lambda q: knn_topk_sq8(emb, q, k=K),
    }
    results: dict[str, dict] = {}
    exact_sets: list[set[int]] = []
    for tier, make in tiers.items():
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=8) as pool:
            sets = list(pool.map(lambda q: topk_ids(make(q[1])), queries))
        sec = round(time.perf_counter() - t0, 3)
        if tier == "exact":
            exact_sets = sets
            results[tier] = {"sec_total": sec, "recall_at_10": 1.0}
            continue
        recalls = [len(s & e) / K for s, e in zip(sets, exact_sets)]
        results[tier] = {
            "sec_total": sec,
            "recall_at_10": round(sum(recalls) / len(recalls), 4),
            "recall_min": round(min(recalls), 4),
            "recall_max": round(max(recalls), 4),
            "sf001_floor": FLOORS[tier],
            "meets_floor": sum(recalls) / len(recalls) >= FLOORS[tier],
        }
        print(f"{tier}: {results[tier]}", flush=True)

    payload = {
        "corpus": CORPUS, "n_vectors": n, "n_queries": len(queries),
        "k": K, "ivf": {"C": 160, "nprobe": 40, "build_sec": build_sec},
        "tiers": results,
    }
    with open(OUT, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
