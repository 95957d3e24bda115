"""Scale soak for the self-growing semantic dedup loop
(`dedup_semantic_incremental`'s operator,
operators/similarity.py semantic_dedup_ingest_step): replay the ×100
soak corpus (200k embeddings, /tmp/sf10_soak_docs — build with
`python tools/soak_sf1.py --decade2`) through 4 vec_id-mod waves with
the knobs scaled the way SCALING.md prescribes — C = 160 so cluster
size stays at the bench corpus's scale (the FAISS sizing rule), the
same nprobe/C fraction intent as the serving tier. Records per-wave
seconds (the flat-per-wave claim: each wave pays O(batch × probed
lists) + C-governed intra grams, never O(index)) plus the verdict
tally. Writes SOAK_SEMDEDUP_INCR.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

CORPUS = "/tmp/sf10_soak_docs"
OUT = os.path.join(REPO, "SOAK_SEMDEDUP_INCR.json")


def main() -> None:
    from pyspark.sql import functions as F

    from crawler_spark.operators.similarity import (
        semantic_dedup_ingest_step,
        train_ivf_centroids,
    )
    from crawler_spark.session import get_spark
    from crawler_spark.sources import load_table

    spark = get_spark(
        "soak-semdedup-incr",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, CORPUS, "embeddings").select(
        "vec_id", "embedding")
    n = emb.count()
    t0 = time.perf_counter()
    cents = train_ivf_centroids(emb, n_centroids=160)
    train_sec = round(time.perf_counter() - t0, 3)

    idx = tempfile.mkdtemp(prefix="semdedup_incr_soak_idx_")
    waves = []
    tally = {"accepted": 0, "dup_of_corpus": 0, "intra_dup": 0}
    t_all = time.perf_counter()
    for k in range(4):
        # wave by COPY index, not vec_id % 4: the ×100 corpus offsets
        # copies by i·10⁹ (a multiple of 4), so a vec_id-mod split
        # would put every copy of the same original in the SAME wave —
        # all duplicates become intra-batch and the cross-wave corpus
        # scoring (the claim under test) never fires. Splitting by
        # copy index sends each original's copies to all 4 waves:
        # wave 0 accepts ~one per original, waves 1-3 must catch their
        # copies AGAINST THE INDEX.
        batch = emb.filter((F.col("vec_id") / 10**9).cast("long") % 4 == k)
        t0 = time.perf_counter()
        out = semantic_dedup_ingest_step(
            spark, batch, idx, cents, threshold=0.95, nprobe=2)
        agg = out.agg(
            F.sum(F.col("accepted").cast("int")).alias("a"),
            F.sum(F.col("dup_of_corpus").cast("int")).alias("d"),
            F.sum(F.col("intra_dup").cast("int")).alias("i"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        sec = round(time.perf_counter() - t0, 3)
        waves.append({"wave": k, "rows": agg.n, "sec": sec,
                      "accepted": agg.a, "dup_of_corpus": agg.d,
                      "intra_dup": agg.i})
        tally["accepted"] += agg.a
        tally["dup_of_corpus"] += agg.d
        tally["intra_dup"] += agg.i
        print(waves[-1], flush=True)
    total = round(time.perf_counter() - t_all, 3)
    shutil.rmtree(idx, ignore_errors=True)

    payload = {
        "corpus": CORPUS, "n_vectors": n, "C": 160, "nprobe": 2,
        "threshold": 0.95, "train_sec": train_sec,
        "total_sec": total, "waves": waves, "tally": tally,
        # per-wave flatness: last wave scores against the largest
        # accepted index, so last/first bounds the index-growth cost
        "wave_sec_last_over_first": round(
            waves[-1]["sec"] / waves[0]["sec"], 3) if waves else None,
    }
    with open(OUT, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
