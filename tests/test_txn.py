"""Cross-table atomic transactions (operators/txn.py).

The reference gets multi-table atomicity from Postgres (pages + job
rows move in one BEGIN/COMMIT — reference backend/src/db.py:42-69);
here the txn log generalizes the per-table manifest protocol: one
atomic rename publishes a consistent state across N tables, and
``read_table_at_txn`` gives cross-table snapshot isolation.
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.txn import (
    commit_transaction,
    read_table_at_txn,
    read_transaction,
    recover_transactions,
    transaction_history,
)
from crawler_spark.streaming.ingest_stream import (
    ConcurrentWriteError,
    read_manifest,
    read_pages_table,
    stage_bucket_data,
)


def _docs(spark, tag: str):
    return spark.createDataFrame(
        [(i, f"{tag}-{i}", i % 4) for i in range(20)],
        "doc_id long, body string, bucket int",
    )


def _embs(spark, tag: str):
    return spark.createDataFrame(
        [(i, float(len(tag)) + i, i % 4) for i in range(20)],
        "doc_id long, norm double, bucket int",
    )


def _stage(dir_, df, epoch) -> dict[int, int]:
    return {b: epoch for b in stage_bucket_data(dir_, df, epoch)}


def _race_committer(txn_dir, table_a, table_b, marker_base, n, barrier):
    """Worker for the two-process commit race (module-level so the
    child can import it regardless of multiprocessing start method)."""
    from crawler_spark.operators.txn import commit_transaction

    barrier.wait()
    for i in range(n):
        commit_transaction(txn_dir, {
            table_a: {0: marker_base + i},
            table_b: {0: marker_base + i},
        })


class TestTwoProcessCommitRace:
    def test_concurrent_processes_never_lose_a_transaction(self, tmp_path):
        """TRUE multiprocess race (not the in-process simulation below):
        two OS processes commit interleaved transactions against the
        same txn log. Every transaction must land under its own version
        (the hard-link CAS retries, never overwrites), every committed
        marker must survive exactly once, and after recovery both
        tables' manifests agree with the newest transaction."""
        import json
        import multiprocessing as mp

        txn = str(tmp_path)
        ta, tb = str(tmp_path / "a"), str(tmp_path / "b")
        n = 8
        barrier = mp.Barrier(2)
        procs = [
            mp.Process(target=_race_committer,
                       args=(txn, ta, tb, base, n, barrier))
            for base in (1000, 2000)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join(120)
        assert all(p.exitcode == 0 for p in procs), \
            [p.exitcode for p in procs]

        hist = transaction_history(txn)
        assert hist == list(range(1, 2 * n + 1)), hist
        key_a = os.path.abspath(ta)
        markers = sorted(read_transaction(txn, v)[key_a][0] for v in hist)
        assert markers == sorted(
            list(range(1000, 1000 + n)) + list(range(2000, 2000 + n)))
        # no stage-file litter from either process
        assert not [f for f in os.listdir(tmp_path / "_txnlog")
                    if f.endswith(".tmp")]
        # concurrent syncs may leave the per-table manifest CACHES at
        # different (each individually committed) txns — the log is the
        # source of truth; recovery converges both to the newest txn
        recover_transactions(txn)
        newest = read_transaction(txn)
        assert read_manifest(ta) == newest[key_a]
        assert read_manifest(tb) == newest[os.path.abspath(tb)]
        # and each pre-recovery manifest state was SOME committed state
        states = {json.dumps(read_transaction(txn, v)[key_a]) for v in hist}
        assert json.dumps(read_manifest(ta)) in states


class TestCrossTableTxn:
    def test_commit_is_atomic_across_tables_and_snapshots_isolate(
        self, spark, tmp_path
    ):
        txn = str(tmp_path)
        docs_dir, embs_dir = str(tmp_path / "docs"), str(tmp_path / "embs")

        v1 = commit_transaction(txn, {
            docs_dir: _stage(docs_dir, _docs(spark, "a"), 0),
            embs_dir: _stage(embs_dir, _embs(spark, "a"), 0),
        })
        v2 = commit_transaction(txn, {
            docs_dir: _stage(docs_dir, _docs(spark, "bb"), 1),
            embs_dir: _stage(embs_dir, _embs(spark, "bb"), 1),
        })
        assert transaction_history(txn) == [v1, v2]

        # snapshot isolation: BOTH tables read at v1 show the v1 state,
        # both at latest show v2 — never a mix.
        d1 = read_table_at_txn(spark, txn, docs_dir, v1)
        e1 = read_table_at_txn(spark, txn, embs_dir, v1)
        assert {r.body for r in d1.collect()} == {f"a-{i}" for i in range(20)}
        assert e1.agg(F.min("norm")).collect()[0][0] == 1.0  # len("a")
        d2 = read_table_at_txn(spark, txn, docs_dir)
        e2 = read_table_at_txn(spark, txn, embs_dir)
        assert {r.body for r in d2.collect()} == {f"bb-{i}" for i in range(20)}
        assert e2.agg(F.min("norm")).collect()[0][0] == 2.0  # len("bb")

        # per-table manifests were synced: single-table readers see v2
        assert {r.body for r in read_pages_table(spark, docs_dir).collect()} \
            == {f"bb-{i}" for i in range(20)}

    def test_staged_data_invisible_until_txn_commit(self, spark, tmp_path):
        txn = str(tmp_path)
        docs_dir, embs_dir = str(tmp_path / "docs"), str(tmp_path / "embs")
        commit_transaction(txn, {
            docs_dir: _stage(docs_dir, _docs(spark, "a"), 0),
            embs_dir: _stage(embs_dir, _embs(spark, "a"), 0),
        })
        # stage BOTH tables' next epoch — no commit yet
        _stage(docs_dir, _docs(spark, "new"), 1)
        _stage(embs_dir, _embs(spark, "new"), 1)
        # txn readers and single-table readers still see the old state
        assert {r.body for r in
                read_table_at_txn(spark, txn, docs_dir).collect()} \
            == {f"a-{i}" for i in range(20)}
        assert {r.body for r in read_pages_table(spark, docs_dir).collect()} \
            == {f"a-{i}" for i in range(20)}
        assert read_manifest(docs_dir) == {b: 0 for b in range(4)}

    def test_crash_between_commit_point_and_sync_recovers(
        self, spark, tmp_path
    ):
        txn = str(tmp_path)
        docs_dir, embs_dir = str(tmp_path / "docs"), str(tmp_path / "embs")
        commit_transaction(txn, {
            docs_dir: _stage(docs_dir, _docs(spark, "a"), 0),
            embs_dir: _stage(embs_dir, _embs(spark, "a"), 0),
        })
        # crash right after the txn-file rename: per-table sync skipped
        commit_transaction(txn, {
            docs_dir: _stage(docs_dir, _docs(spark, "x"), 1),
            embs_dir: _stage(embs_dir, _embs(spark, "x"), 1),
        }, sync_tables=False)

        # per-table manifests lag but are CONSISTENT with each other
        assert read_manifest(docs_dir) == {b: 0 for b in range(4)}
        assert read_manifest(embs_dir) == {b: 0 for b in range(4)}
        # the txn itself is durable — txn readers already see the commit
        assert {r.body for r in
                read_table_at_txn(spark, txn, docs_dir).collect()} \
            == {f"x-{i}" for i in range(20)}

        # startup replay repairs the caches; replay again = no-op
        ver = recover_transactions(txn)
        assert ver == 2
        assert read_manifest(docs_dir) == {b: 1 for b in range(4)}
        assert recover_transactions(txn) == 2
        embs = read_pages_table(spark, embs_dir)
        assert embs.agg(F.min("norm")).collect()[0][0] == 1.0  # len("x")

    def test_partial_table_update_carries_other_tables_forward(
        self, spark, tmp_path
    ):
        """A txn that only rewrites one table must still record the
        other's unchanged manifest so every version is a FULL state."""
        txn = str(tmp_path)
        docs_dir, embs_dir = str(tmp_path / "docs"), str(tmp_path / "embs")
        docs_m = _stage(docs_dir, _docs(spark, "a"), 0)
        embs_m = _stage(embs_dir, _embs(spark, "a"), 0)
        commit_transaction(txn, {docs_dir: docs_m, embs_dir: embs_m})
        # only docs move; embeddings state is carried forward verbatim
        commit_transaction(txn, {
            docs_dir: _stage(docs_dir, _docs(spark, "b"), 1),
            embs_dir: embs_m,
        })
        state = read_transaction(txn)
        assert state[os.path.abspath(docs_dir)] == {b: 1 for b in range(4)}
        assert state[os.path.abspath(embs_dir)] == {b: 0 for b in range(4)}
        e = read_table_at_txn(spark, txn, embs_dir)
        assert e.count() == 20

    def test_merge_into_bucketed_prunes_and_matches_full_merge(
        self, spark, tmp_path
    ):
        """File-pruned MERGE INTO: a batch touching buckets {0,1} must
        rewrite ONLY those buckets (manifest keeps the rest on the base
        epoch) and produce exactly the rows a full-table merge_by_key
        would; a pruned DELETE that empties a bucket drops it from the
        manifest."""
        from crawler_spark.operators.upsert import (
            delete_from_bucketed,
            merge_by_key,
            merge_into_bucketed,
        )

        table = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(i, f"v{i}", i % 4) for i in range(40)],
            "id long, val string, bucket int",
        )
        merge_into_bucketed(spark, table, base, key="id")
        m0 = read_manifest(table)
        assert set(m0) == {0, 1, 2, 3}

        batch = spark.createDataFrame(
            [(i, f"new{i}", i % 4) for i in range(40) if i % 4 < 2]
            + [(100, "ins", 100 % 4)],
            "id long, val string, bucket int",
        )
        merge_into_bucketed(spark, table, batch, key="id")
        m1 = read_manifest(table)
        assert m1[2] == m0[2] and m1[3] == m0[3], (
            "untouched buckets must keep their base epoch (pruning)")
        assert m1[0] > m0[0] and m1[1] > m0[1]

        got = {(r.id, r.val) for r in read_pages_table(spark, table).collect()}
        want = {(r.id, r.val)
                for r in merge_by_key(base, batch, key="id").collect()}
        assert got == want

        # delete everything in bucket 2 → manifest entry dropped
        dels = spark.createDataFrame(
            [(i, i % 4) for i in range(40) if i % 4 == 2],
            "id long, bucket int")
        delete_from_bucketed(spark, table, dels, key="id")
        m2 = read_manifest(table)
        assert 2 not in m2, "emptied bucket must leave the manifest"
        assert m2[3] == m0[3], "delete must not rewrite untouched buckets"
        n = read_pages_table(spark, table).count()
        assert n == len(want) - 10

        # missing bucket column is a usage error
        with pytest.raises(ValueError):
            merge_into_bucketed(
                spark, table, batch.drop("bucket"), key="id")

    def test_merge_into_bucketed_delete_condition(self, spark, tmp_path):
        """MERGE's WHEN MATCHED DELETE: rows matching the post-merge
        predicate are removed in the same commit."""
        from crawler_spark.operators.upsert import merge_into_bucketed

        table = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(1, "keep", 0, 0), (2, "x", 0, 0), (3, "keep", 1, 0)],
            "id long, val string, bucket int, dead int",
        )
        merge_into_bucketed(spark, table, base, key="id")
        batch = spark.createDataFrame(
            [(2, "x", 0, 1)], "id long, val string, bucket int, dead int")
        merge_into_bucketed(
            spark, table, batch, key="id",
            delete_condition=F.col("dead") == 1)
        got = sorted(r.id for r in read_pages_table(spark, table).collect())
        assert got == [1, 3]

    def test_racing_committers_never_lose_a_transaction(self, tmp_path):
        """The commit point is a hard-link compare-and-swap: when the
        version a committer computed is taken by a concurrent commit,
        it must retry with the next version — never overwrite. Simulate
        the race by pre-claiming the version the committer will pick."""
        txn = str(tmp_path)
        # tmp-scoped table dirs: commit_transaction now takes each
        # participating table's writer lock, so a bare relative name
        # would create lock litter in the process CWD
        ta = str(tmp_path / "a")
        v1 = commit_transaction(txn, {ta: {0: 1}}, sync_tables=False)
        # another committer that read the same "latest" publishes first
        log = tmp_path / "_txnlog"
        (log / f"{v1 + 1:08d}.json").write_text('{"tables": {"b": {"0": 7}}}')
        v2 = commit_transaction(txn, {ta: {0: 2}}, sync_tables=False)
        assert v2 == v1 + 2, "loser must take the NEXT free version"
        assert transaction_history(txn) == [v1, v1 + 1, v1 + 2]
        # both committed states are intact — nothing overwritten
        assert read_transaction(txn, v1 + 1) == {"b": {0: 7}}
        assert list(read_transaction(txn, v2).values()) == [{0: 2}]
        # no stage-file litter left behind
        assert not [f for f in os.listdir(log) if f.endswith(".tmp")]

    def test_unknown_version_table_and_empty_states(self, spark, tmp_path):
        txn = str(tmp_path)
        docs_dir = str(tmp_path / "docs")
        with pytest.raises(KeyError):
            read_transaction(txn)  # empty log
        assert recover_transactions(txn) is None
        commit_transaction(txn, {
            docs_dir: _stage(docs_dir, _docs(spark, "a"), 0),
            str(tmp_path / "empty"): {},  # a table the txn knows is empty
        })
        with pytest.raises(KeyError):
            read_transaction(txn, 99)
        with pytest.raises(KeyError):
            read_table_at_txn(spark, txn, str(tmp_path / "nope"))
        assert read_table_at_txn(spark, txn, str(tmp_path / "empty")) is None


class TestMergeEpochIntegrity:
    def test_epoch_never_reused_after_delete(self, spark, tmp_path):
        """A delete that empties the max-epoch bucket must NOT let the
        next commit reuse a published epoch: the reused directory would
        dynamic-overwrite files an older snapshot still references,
        silently corrupting time travel (epochs come from the snapshot
        log, not max over the LIVE manifest)."""
        from crawler_spark.operators.upsert import (
            delete_from_bucketed,
            merge_into_bucketed,
        )
        from crawler_spark.streaming.ingest_stream import (
            manifest_history,
            read_pages_table_at,
        )

        table = str(tmp_path / "t")
        schema = "id long, val string, bucket int"
        base = spark.createDataFrame(
            [(0, "a0", 0), (1, "b0", 1)], schema)
        merge_into_bucketed(spark, table, base, key="id")
        # bump bucket 0 to the max epoch
        merge_into_bucketed(
            spark, table,
            spark.createDataFrame([(0, "a1", 0)], schema), key="id")
        v_pre = manifest_history(table)[-1]
        pre = {(r.id, r.val)
               for r in read_pages_table_at(spark, table, v_pre).collect()}
        assert (0, "a1") in pre
        # empty the max-epoch bucket, then write NEW bucket-0 content
        delete_from_bucketed(
            spark, table,
            spark.createDataFrame([(0, 0)], "id long, bucket int"), key="id")
        merge_into_bucketed(
            spark, table,
            spark.createDataFrame([(0, "a2", 0)], schema), key="id")
        # the pre-delete snapshot must still read its OWN rows
        got = {(r.id, r.val)
               for r in read_pages_table_at(spark, table, v_pre).collect()}
        assert got == pre, "old snapshot sees rows written after it"

    def test_delete_condition_scoped_to_matched_keys(self, spark, tmp_path):
        """WHEN MATCHED DELETE applies only to rows whose KEY is in the
        batch — a pre-existing row sharing a hash bucket with the batch
        must survive even when it satisfies the delete predicate."""
        from crawler_spark.operators.upsert import merge_into_bucketed
        from crawler_spark.streaming.ingest_stream import read_pages_table

        table = str(tmp_path / "t")
        schema = "id long, val string, bucket int, dead int"
        base = spark.createDataFrame(
            [(1, "bystander", 0, 1), (2, "target", 0, 1), (3, "other", 1, 1)],
            schema)
        merge_into_bucketed(spark, table, base, key="id")
        batch = spark.createDataFrame([(2, "target", 0, 1)], schema)
        merge_into_bucketed(
            spark, table, batch, key="id",
            delete_condition=F.col("dead") == 1)
        got = sorted(r.id for r in read_pages_table(spark, table).collect())
        assert got == [1, 3], (
            "unmatched rows were deleted by bucket co-location")


class TestTxnRecoveryOrdering:
    def test_recovery_never_regresses_a_newer_table_commit(
        self, spark, tmp_path
    ):
        """recover_transactions must NOT replay a txn over a table that
        a LATER single-table commit has moved past — the mlog version
        recorded at txn-commit time fences the replay."""
        from crawler_spark.operators.upsert import merge_into_bucketed

        a = str(tmp_path / "a")
        m0 = _stage(a, _docs(spark, "t0"), 0)
        ver = commit_transaction(str(tmp_path / "txn"), {a: m0})
        # later single-table commit advances the table past the txn
        newer = spark.createDataFrame(
            [(0, "newer-0", 0)], "doc_id long, body string, bucket int")
        merge_into_bucketed(spark, a, newer, key="doc_id")
        live_before = {(r.doc_id, r.body)
                       for r in read_pages_table(spark, a).collect()}
        assert (0, "newer-0") in live_before
        # a writer restart replays the newest txn — it must be fenced
        assert recover_transactions(str(tmp_path / "txn")) == ver
        live_after = {(r.doc_id, r.body)
                      for r in read_pages_table(spark, a).collect()}
        assert live_after == live_before, (
            "recovery regressed the table to the txn's older state")

    def test_vacuum_rejects_zero_retention(self, spark, tmp_path):
        """retain_last=0 would prune the snapshot anchoring the epoch
        allocator while live data still exists — rejected loudly."""
        from crawler_spark.operators.upsert import merge_into_bucketed
        from crawler_spark.streaming.ingest_stream import vacuum_pages_table

        t = str(tmp_path / "t")
        merge_into_bucketed(
            spark, t,
            spark.createDataFrame([(1, "x", 0)],
                                  "id long, val string, bucket int"),
            key="id")
        with pytest.raises(ValueError):
            vacuum_pages_table(t, retain_last=0)

    def test_merge_preserves_evolved_column_values(self, spark, tmp_path):
        """Schema evolution: a column present only in newer-epoch
        buckets must survive a merge touching those buckets — the
        existing-read uses mergeSchema, so the rewrite cannot silently
        null a column one file's inferred schema lacks."""
        from crawler_spark.operators.upsert import merge_into_bucketed
        from crawler_spark.streaming.ingest_stream import read_pages_table

        t = str(tmp_path / "t")
        merge_into_bucketed(
            spark, t,
            spark.createDataFrame([(1, "v1", 0)],
                                  "id long, val string, bucket int"),
            key="id")
        # additive evolution: second commit carries a new column
        merge_into_bucketed(
            spark, t,
            spark.createDataFrame([(2, "v2", 0, "en")],
                                  "id long, val string, bucket int, lang string"),
            key="id")
        # merge an unrelated key into the same bucket
        merge_into_bucketed(
            spark, t,
            spark.createDataFrame([(3, "v3", 0)],
                                  "id long, val string, bucket int"),
            key="id")
        rows = {r.id: r.asDict() for r in read_pages_table(spark, t).collect()}
        assert rows[2].get("lang") == "en", (
            "merge rewrote the bucket without the evolved column's data")


class TestSyncSkipLogging:
    def test_every_repeated_skip_is_logged(self, tmp_path, caplog):
        """Review-found: warnings.warn collapses repeats per call site
        under the default filter, so only the FIRST lock-contended
        sync skip ever surfaced. The logging channel must record every
        skip — two consecutive contended syncs, two records."""
        import logging

        from crawler_spark.operators.txn import _sync_table_manifests
        from crawler_spark.streaming.ingest_stream import table_write_lock

        t = str(tmp_path / "tbl")
        payload = {"tables": {t: {"0": 0}}}
        with table_write_lock(t):  # a second fd cannot take the flock
            with caplog.at_level(logging.WARNING, logger="crawler_spark.txn"):
                _sync_table_manifests(payload)
                _sync_table_manifests(payload)
        skips = [r for r in caplog.records
                 if "txn sync skipped" in r.getMessage()]
        assert len(skips) == 2, [r.getMessage() for r in caplog.records]


class TestCommitConcurrencyAndRecoveryGuards:
    def test_commit_conflicts_fail_before_the_commit_point(self, tmp_path):
        """OCC semantics (review-found): two transactions over the same
        table must serialize on its writer lock, and the loser must
        fail BEFORE the commit point — the old code let the link-CAS
        loser commit a LATER txn version carrying a fence read before
        the winner's commit, permanently diverging the txn log's
        latest state from the live table (its sync and every recovery
        replay saw the advanced mlog and skipped)."""
        from crawler_spark.streaming.ingest_stream import table_write_lock

        txn = str(tmp_path / "txn")
        a = str(tmp_path / "a")
        with table_write_lock(a):
            with pytest.raises(ConcurrentWriteError):
                # short deadline: the production default (60 s of
                # exponential backoff) exists to outlast real merges
                commit_transaction(txn, {a: {0: 1}}, lock_timeout_sec=0.2)
        # nothing committed: the failure happened pre-commit
        assert transaction_history(txn) == []
        # and with the lock released the same commit succeeds
        assert commit_transaction(txn, {a: {0: 1}}) == 1

    def test_commit_backoff_outlasts_a_long_held_writer_lock(self, tmp_path):
        """Review-found round 11: the old fixed 10-retry/~1.1 s budget
        spuriously failed any cross-table commit racing a single-table
        merge that holds its writer lock for a realistic job duration.
        The deadline-based exponential backoff must win the lock once
        the merge releases it — here the "merge" holds the lock well
        past the old total budget."""
        import threading
        import time

        from crawler_spark.streaming.ingest_stream import table_write_lock

        txn = str(tmp_path / "txn")
        a = str(tmp_path / "a")
        release = threading.Event()
        held = threading.Event()

        def merge_holder():
            with table_write_lock(a):
                held.set()
                release.wait(10.0)

        t = threading.Thread(target=merge_holder, daemon=True)
        t.start()
        assert held.wait(5.0)
        timer = threading.Timer(2.0, release.set)  # > old ~1.1 s budget
        timer.start()
        try:
            assert commit_transaction(
                txn, {a: {0: 1}}, lock_timeout_sec=30.0) == 1
        finally:
            release.set()
            timer.cancel()
            t.join(5.0)

    def test_recovery_never_publishes_vacuumed_directories(
        self, spark, tmp_path, caplog
    ):
        """A txn committed but unsynced (crash window), whose staged
        directories a per-table vacuum later reclaimed, must NOT be
        replayed into the live manifest — publishing it bricks every
        read with a raw path-not-found (review-found). Recovery leaves
        the table on its own consistent state and logs the skip."""
        import logging
        import shutil

        txn = str(tmp_path / "txn")
        a = str(tmp_path / "a")
        m0 = _stage(a, _docs(spark, "live"), 0)
        commit_transaction(txn, {a: m0})  # synced, live
        m1 = _stage(a, _docs(spark, "crashed"), 1)
        commit_transaction(txn, {a: m1}, sync_tables=False)  # crash window
        # "vacuum" reclaims the unreferenced v=1 staging
        shutil.rmtree(os.path.join(a, "v=1"))
        before = read_manifest(a)
        with caplog.at_level(logging.ERROR, logger="crawler_spark.txn"):
            recover_transactions(txn)
        assert read_manifest(a) == before, "recovery bricked the table"
        assert any("vacuumed" in r.getMessage() for r in caplog.records)
        # the table still reads its consistent pre-crash state
        assert {r.body for r in read_pages_table(spark, a).collect()} \
            == {f"live-{i}" for i in range(20)}

    def test_post_commit_sync_failure_never_fails_the_commit(
        self, spark, tmp_path, monkeypatch, caplog
    ):
        """The sync runs after the commit point, so ANY failure there
        (not just lock contention) must be logged, not raised — a
        raising commit_transaction invites the caller to retry and
        commit a duplicate txn version (review-found)."""
        import logging

        import crawler_spark.operators.txn as txn_mod

        txn = str(tmp_path / "txn")
        a = str(tmp_path / "a")
        m0 = _stage(a, _docs(spark, "x"), 0)

        def boom(*args, **kwargs):
            raise OSError("disk full")

        monkeypatch.setattr(txn_mod, "commit_manifest", boom)
        with caplog.at_level(logging.ERROR, logger="crawler_spark.txn"):
            ver = commit_transaction(txn, {a: m0})
        assert ver == 1 and transaction_history(txn) == [1]
        assert any("after the commit point" in r.getMessage()
                   for r in caplog.records)
        monkeypatch.undo()
        # recovery converges the lagging manifest once the fault clears
        recover_transactions(txn)
        assert read_manifest(a) == m0
