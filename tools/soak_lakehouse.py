"""Lakehouse/txn tier soak (verdict r11 item 6): the one scale-critical
family both earlier soak decades skipped. Measures the manifest-table
operators at ×1 and ×10 row counts and records a concurrent-committer
stress run against the round-11 backoff-deadline lock. Writes
SOAK_LAKEHOUSE.json; SCALING.md carries the interpretation.

What each phase is DESIGNED to show at 100 TB:

* build        — initial bucketed load: O(table), expect ~linear.
* merge_pruned — a key-clustered batch merging into a table whose
  BUCKET COUNT scales with the data (32 → 320, the production sizing
  rule: bucket size constant, count grows). Touched buckets and batch
  size are identical at both scales, so a file-pruned MERGE must stay
  ~FLAT across the decade — the O(touched), never O(table), property.
* scd2         — dimension update: only the current slice joins the
  batch, expect ~linear in the dimension.
* snapshot_read / cdf — time travel reads the whole old snapshot
  (~linear); the change feed reads only buckets whose epoch differs
  between the snapshots, so like the merge it must stay ~flat.
* compact      — OPTIMIZE over fragmented buckets: O(table), ~linear.
* concurrency  — T threads × M merges each into ONE table (writer
  lock + caller retry, the documented contract) must lose no update;
  T threads committing cross-table transactions through
  commit_transaction's backoff deadline must all land, with txn
  history = exactly T×M versions.

Usage: python tools/soak_lakehouse.py [--quick]  (quick: ×1 only)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

WORK = "/tmp/lakehouse_soak"
OUT = os.path.join(REPO, "SOAK_LAKEHOUSE.json")

# (tag, rows, buckets): bucket count scales with rows — the production
# rule (constant bucket size), and what makes merge/cdf flatness a
# meaningful claim rather than an artifact of shrinking batches
SCALES = [("x1", 200_000, 32), ("x10", 2_000_000, 320)]


def _df(spark, n: int, buckets: int, start: int = 0, tag: str = "a"):
    """Deterministic synthetic rows: string key, ~120-char payload,
    a recency column, and the table's bucket column."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.upsert import key_bucket

    return (
        spark.range(start, start + n)
        .select(
            F.format_string("k%012d", F.col("id")).alias("key"),
            F.sha2(F.concat(F.lit(tag), F.col("id").cast("string")), 256)
            .alias("payload"),
            (F.col("id") % 1000).cast("double").alias("score"),
            F.lit(tag).alias("src"),
            F.col("id").cast("long").alias("updated_at"),
        )
        .withColumn("bucket", key_bucket("key", buckets))
    )


def soak_scale(spark, tag: str, n: int, buckets: int) -> dict:
    from pyspark.sql import functions as F

    from crawler_spark.operators.layout import compact_files
    from crawler_spark.operators.upsert import merge_into_bucketed, scd2_apply
    from crawler_spark.streaming.ingest_stream import (
        compact_pages_table,
        pages_changes,
        read_pages_table,
        read_pages_table_at,
    )

    tbl = os.path.join(WORK, f"tbl_{tag}")
    shutil.rmtree(tbl, ignore_errors=True)
    out: dict[str, float] = {}

    t0 = time.perf_counter()
    v_build = merge_into_bucketed(spark, tbl, _df(spark, n, buckets),
                                  key="key", recency_col="updated_at")
    out["build_sec"] = round(time.perf_counter() - t0, 3)

    # key-clustered batch: every key in buckets 0..7 (same touched set
    # and ~same batch rows at both scales because bucket size is held
    # constant by the scaled bucket count)
    batch = (_df(spark, n, buckets, tag="b")
             .filter(F.col("bucket") < 8)
             .withColumn("updated_at", F.col("updated_at") + 1))
    batch_rows = batch.count()
    t0 = time.perf_counter()
    merge_into_bucketed(spark, tbl, batch, key="key",
                        recency_col="updated_at")
    out["merge_pruned_sec"] = round(time.perf_counter() - t0, 3)
    out["merge_pruned_batch_rows"] = batch_rows

    # five more small random-key merges to fragment files for
    # compaction and to grow snapshot history for time travel
    for i in range(5):
        inc = (_df(spark, n // 100, buckets, start=n + i * (n // 100),
                   tag=f"inc{i}"))
        merge_into_bucketed(spark, tbl, inc, key="key",
                            recency_col="updated_at")

    t0 = time.perf_counter()
    snap = read_pages_table_at(spark, tbl, v_build)
    n_snap = snap.count()
    out["snapshot_read_sec"] = round(time.perf_counter() - t0, 3)
    assert n_snap == n, (n_snap, n)

    t0 = time.perf_counter()
    feed = pages_changes(spark, tbl, v_build, v_build + 1, key="key")
    out["cdf_rows"] = feed.count()
    out["cdf_sec"] = round(time.perf_counter() - t0, 3)

    # the manifest merges leave one file per bucket directory, so the
    # manifest-level OPTIMIZE has nothing to rewrite here (recorded —
    # it is the streaming appender that fragments); the O(data) rewrite
    # cost is measured on compact_files over a directory fragmented the
    # way an append pipeline fragments: file count ∝ batches ∝ data
    out["compact_manifest_buckets"] = compact_pages_table(
        spark, tbl, min_files=2)
    frag = os.path.join(WORK, f"frag_{tag}")
    shutil.rmtree(frag, ignore_errors=True)
    _df(spark, n, buckets).repartition(10 * buckets).write.mode(
        "overwrite").parquet(frag)
    t0 = time.perf_counter()
    stats = compact_files(spark, frag, frag + "_out",
                          target_bytes=32 << 20)
    out["compact_sec"] = round(time.perf_counter() - t0, 3)
    out["compact_files_before"] = stats["files_before"]
    out["compact_files_after"] = stats["files_after"]

    final = read_pages_table(spark, tbl).count()
    assert final == n + 5 * (n // 100), (final, n)

    # SCD2 over a dimension of the same row count: 10% of keys change
    dim = _df(spark, n, buckets).select(
        "key", "payload", "score",
        F.to_date(F.lit("2026-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    ).localCheckpoint(eager=True)
    upd = (_df(spark, n // 10, buckets, tag="scd")
           .select("key", "payload", "score"))
    t0 = time.perf_counter()
    scd2_apply(dim, upd, key="key", tracked=["payload", "score"],
               effective_date="2026-06-01").write.format("noop").mode(
        "overwrite").save()
    out["scd2_sec"] = round(time.perf_counter() - t0, 3)
    return out


def soak_concurrency(spark, n: int = 500_000, buckets: int = 64,
                     writers: int = 4, merges_each: int = 3) -> dict:
    """T threads × M disjoint-key merges into ONE table, retrying on
    ConcurrentWriteError (the documented caller contract around the
    non-blocking writer lock) — no update may be lost. Then T threads
    each committing M cross-table transactions through
    commit_transaction's backoff deadline — all must land."""
    import threading

    from crawler_spark.operators.txn import commit_transaction
    from crawler_spark.operators.upsert import merge_into_bucketed
    from crawler_spark.streaming.ingest_stream import (
        ConcurrentWriteError,
        read_manifest,
        read_pages_table,
    )

    tbl = os.path.join(WORK, "tbl_conc")
    shutil.rmtree(tbl, ignore_errors=True)
    merge_into_bucketed(spark, tbl, _df(spark, n, buckets), key="key",
                        recency_col="updated_at")
    errors: list[str] = []
    retries = [0]
    lock = threading.Lock()

    def writer(w: int) -> None:
        try:
            for m in range(merges_each):
                start = n + (w * merges_each + m) * 10_000
                batch = _df(spark, 10_000, buckets, start=start,
                            tag=f"w{w}m{m}")
                delay = 0.05
                while True:
                    try:
                        merge_into_bucketed(spark, tbl, batch, key="key",
                                            recency_col="updated_at")
                        break
                    except ConcurrentWriteError:
                        with lock:
                            retries[0] += 1
                        time.sleep(delay)
                        delay = min(delay * 2, 1.0)
        except Exception as exc:  # pragma: no cover - recorded, not raised
            errors.append(f"w{w}: {type(exc).__name__}: {exc}")

    t0 = time.perf_counter()
    threads = [threading.Thread(target=writer, args=(w,))
               for w in range(writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    merge_wall = round(time.perf_counter() - t0, 3)
    final = read_pages_table(spark, tbl).count()
    expect = n + writers * merges_each * 10_000

    # cross-table txn stress: each thread re-publishes both tables'
    # CURRENT manifests as one atomic transaction, through the
    # backoff-deadline lock path (contention is on the table locks)
    tbl2 = os.path.join(WORK, "tbl_conc2")
    shutil.rmtree(tbl2, ignore_errors=True)
    merge_into_bucketed(spark, tbl2, _df(spark, 10_000, 8), key="key")
    txn_dir = os.path.join(WORK, "txn_conc")
    shutil.rmtree(txn_dir, ignore_errors=True)
    txn_errors: list[str] = []

    def committer(w: int) -> None:
        try:
            for _ in range(merges_each):
                states = {tbl: read_manifest(tbl), tbl2: read_manifest(tbl2)}
                commit_transaction(txn_dir, states, lock_timeout_sec=120.0)
        except Exception as exc:  # pragma: no cover
            txn_errors.append(f"w{w}: {type(exc).__name__}: {exc}")

    t0 = time.perf_counter()
    threads = [threading.Thread(target=committer, args=(w,))
               for w in range(writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    txn_wall = round(time.perf_counter() - t0, 3)
    from crawler_spark.operators.txn import transaction_history

    return {
        "writers": writers, "merges_each": merges_each,
        "merge_wall_sec": merge_wall, "merge_retries": retries[0],
        "rows_final": final, "rows_expected": expect,
        "lost_updates": expect - final, "merge_errors": errors,
        "txn_wall_sec": txn_wall,
        "txn_versions": len(transaction_history(txn_dir)),
        "txn_expected": writers * merges_each, "txn_errors": txn_errors,
    }


def main() -> None:
    from crawler_spark.session import get_spark

    spark = get_spark(
        "soak-lakehouse", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(WORK, exist_ok=True)

    scales = SCALES[:1] if "--quick" in sys.argv else SCALES
    results: dict[str, dict] = {}
    for tag, n, buckets in scales:
        t0 = time.perf_counter()
        results[tag] = {"rows": n, "buckets": buckets,
                        **soak_scale(spark, tag, n, buckets)}
        print(f"{tag}: {results[tag]} "
              f"({round(time.perf_counter() - t0, 1)}s)", flush=True)

    results["concurrency"] = soak_concurrency(spark)
    print("concurrency:", results["concurrency"], flush=True)

    if all(t in results for t, _, _ in SCALES):
        x1, x10 = results["x1"], results["x10"]
        results["ratios_vs_10x"] = {
            k[:-4]: round(x10[k] / (10 * x1[k]), 3)
            for k in ("build_sec", "scd2_sec", "snapshot_read_sec",
                      "compact_sec")
            if x1.get(k)
        }
        # flat-by-design phases: report the raw x10/x1 ratio (≈1 is
        # the claim, not ≤10)
        results["flat_phase_ratio_x10_over_x1"] = {
            k[:-4]: round(x10[k] / x1[k], 3)
            for k in ("merge_pruned_sec", "cdf_sec") if x1.get(k)
        }
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
        fh.write("\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
