"""Cross-table atomic transactions over manifest tables.

The single-table manifest protocol (streaming/ingest_stream.py) gives
each table Delta-grade crash-atomic commits — but a pipeline state is
usually SEVERAL tables that must move together: pages + their
embeddings (re-embed after an update), pages + the inverted index,
train shards + their stats card. The reference gets this for free from
Postgres transactions (backend/src/db.py commits pages and job rows in
one BEGIN/COMMIT); per-table manifests alone re-open that window — a
reader between two per-table swaps sees new docs with old embeddings,
exactly the drift `dq_embedding_coverage` exists to catch.

Protocol (one level above the per-table manifests, same moves):

  * A transaction directory holds ``_txnlog/<ver>.json``, each file
    the FULL state of every participating table (table dir → its
    bucket→epoch manifest). The atomic ``os.replace`` of that one
    file is THE commit point for the whole set of tables.
  * Participating tables' data is staged exactly as before (new
    ``v=<epoch>`` directories, never touching live data) — the txn
    file only swaps pointers, so commit cost is O(1) regardless of
    table count or size.
  * After the txn commit, each table's own ``_MANIFEST.json`` is
    synced (so single-table readers and tools keep working). A crash
    between txn commit and sync leaves per-table manifests one commit
    behind but CONSISTENT with each other; ``recover_transactions``
    replays the newest txn into them idempotently — the same
    "source of truth first, caches after" ordering the per-table
    protocol uses for its own mlog.

Cross-table snapshot isolation falls out: ``read_table_at_txn`` reads
every table from the SAME txn version, so a consumer can never observe
table A at version n and table B at version n−1. This is the one
capability even Delta Lake lacks (transactions are per-table there
too); the miniature is honest because all state lives in one file.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from crawler_spark.streaming.ingest_stream import (
    ConcurrentWriteError,
    _bucket_paths,
    commit_manifest,
    manifest_history,
    read_buckets,
    read_manifest,
    table_write_lock,
)

TXNLOG_NAME = "_txnlog"


def _txn_versions(txn_dir: str) -> list[int]:
    log_dir = os.path.join(txn_dir, TXNLOG_NAME)
    if not os.path.isdir(log_dir):
        return []
    return sorted(
        int(f[:-5]) for f in os.listdir(log_dir)
        if f.endswith(".json") and f[:-5].isdigit()
    )


def commit_transaction(
    txn_dir: str,
    states: dict[str, dict[int, int]],
    sync_tables: bool = True,
    use_locks: bool = True,
    lock_timeout_sec: float = 60.0,
) -> int:
    """Atomically publish a consistent state across every table in
    ``states`` (table dir → bucket→epoch manifest). The atomic rename
    of the txn file is the commit point; everything staged before it
    is invisible, everything after it is cache maintenance.

    ``sync_tables=False`` skips the per-table manifest sync — used by
    tests to simulate a crash immediately after the commit point, and
    repaired by ``recover_transactions``. ``use_locks=False`` skips
    taking the per-table writer locks (flock is not reentrant — pass
    it when the caller already holds ALL of them; the fence-stability
    argument below then rests on the caller's locks).

    Concurrency: ALL participating tables' writer locks are acquired
    (sorted order — no deadlock) BEFORE the fences are read and held
    through commit + sync. Without this, two concurrent transactions
    over the same table both read fence h; the link-CAS loser commits
    a LATER txn version carrying the stale fence, its own sync (and
    every future recovery replay) then sees the winner's mlog at h+1
    and skips — the txn log's latest state and the live table diverge
    PERMANENTLY (review-found). Serializing the fence-read+commit
    window also gives write-write conflicts the per-table layer's
    semantics: the second committer waits (brief retries), then gets
    ConcurrentWriteError BEFORE the commit point — always safe to
    retry with freshly staged state."""
    if use_locks:
        import contextlib
        import time

        tables = sorted({os.path.abspath(t) for t in states})
        last_err: Exception | None = None
        # Exponential backoff against a DEADLINE, not a retry count
        # (review-found round 11): a fixed 10×~0.1 s budget lost races
        # against any single-table merge that holds its writer lock for
        # the duration of a real read-merge-write Spark job (seconds to
        # minutes) — concurrent cross-table commits spuriously died
        # with ConcurrentWriteError. Sorted acquisition order is kept
        # for deadlock freedom; the deadline is configurable so callers
        # wrapping very long merges can extend it.
        deadline = time.monotonic() + lock_timeout_sec
        delay = 0.02
        while True:
            try:
                with contextlib.ExitStack() as stack:
                    for t in tables:
                        stack.enter_context(table_write_lock(t))
                    return _commit_transaction_locked(
                        txn_dir, states, sync_tables)
            except ConcurrentWriteError as e:
                last_err = e
                if time.monotonic() >= deadline:
                    raise last_err
                time.sleep(min(delay, max(0.0, deadline - time.monotonic())))
                delay = min(delay * 2, 1.0)
    return _commit_transaction_locked(txn_dir, states, sync_tables)


def _commit_transaction_locked(
    txn_dir: str, states: dict[str, dict[int, int]], sync_tables: bool,
) -> int:
    """Commit body — caller holds (or has waived) every participating
    table's writer lock, so the fences read here cannot move before
    the sync applies them."""
    log_dir = os.path.join(txn_dir, TXNLOG_NAME)
    os.makedirs(log_dir, exist_ok=True)

    def _fence(t: str) -> int:
        # each table's per-table mlog version AT COMMIT TIME: the sync
        # (and any later recovery replay) applies this txn's state
        # only while the table has no NEWER per-table commit — without
        # the fence, recover_transactions would regress a table past
        # data a later single-table merge committed (and vacuum would
        # then reclaim that data's directories permanently)
        h = manifest_history(t)
        return h[-1] if h else 0

    payload = {
        "tables": {
            os.path.abspath(t): {str(b): e for b, e in sorted(m.items())}
            for t, m in states.items()
        },
        "mlog_at_commit": {os.path.abspath(t): _fence(t) for t in states},
    }
    # Stage once under a collision-free name, then publish via
    # hard-link compare-and-swap: os.link refuses to clobber, so two
    # concurrent committers racing for the same version get exactly one
    # winner; the loser retries with the next version instead of
    # silently overwriting a committed transaction (os.replace would
    # last-writer-win that race). Overlapping-table committers are
    # already serialized by the writer locks above; the CAS still
    # guards committers over DISJOINT table sets sharing one txn log.
    tmp = os.path.join(log_dir, f".stage-{os.getpid()}-{id(payload)}.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        versions = _txn_versions(txn_dir)
        ver = (versions[-1] + 1) if versions else 1
        while True:
            try:
                os.link(tmp, os.path.join(log_dir, f"{ver:08d}.json"))
                break  # COMMIT point
            except FileExistsError:
                ver += 1  # lost the race for this version; take the next
    finally:
        os.unlink(tmp)
    if sync_tables:
        # locks are already held (or waived) — never re-acquire here
        _sync_table_manifests(payload, use_locks=False)
    return ver


def _sync_table_manifests(
    payload: dict, use_locks: bool = True, verify_dirs: bool = False,
) -> None:
    # Each table's manifest swap runs under that table's own writer
    # lock — the txn file is the source of truth, but the per-table
    # sync is still a read-modify-write a concurrent single-table
    # writer could interleave with.
    #
    # The sync runs AFTER the commit point, so it must never make a
    # durable transaction look failed: on a lock held by a live writer
    # it retries briefly, then SKIPS that table — whoever holds the
    # lock is publishing some committed state of its own, the
    # mlog_at_commit fence prevents regression either way, and
    # ``recover_transactions`` converges any table whose cache was
    # left behind (the same repair path as a crash between commit and
    # sync). Found by the two-process race test (tests/test_txn.py):
    # raising ConcurrentWriteError here invited the caller to retry a
    # transaction that had already committed.
    import logging
    import time

    log = logging.getLogger("crawler_spark.txn")
    fences = payload.get("mlog_at_commit", {})
    for t, m in payload["tables"].items():
        manifest = {int(b): int(e) for b, e in m.items()}

        def _sync_if_not_superseded():
            # ordering fence (checked UNDER the lock): the table has
            # moved past this txn if its mlog advanced beyond the
            # version recorded at txn commit — a later single-table
            # commit (or this txn's own completed sync) owns the live
            # state now; replaying the txn would regress it
            fence = fences.get(t)
            if fence is not None:
                history = manifest_history(t)
                if history and history[-1] > int(fence):
                    return
            if manifest != read_manifest(t):
                if verify_dirs:
                    # vacuum guard (review-found), RECOVERY path only —
                    # the commit-path sync publishes directories its
                    # caller just staged, but a recovery replay of a
                    # pre-crash txn can point at directories a
                    # per-table vacuum (which doesn't know the txn
                    # log) already reclaimed; publishing that manifest
                    # BRICKS the live table (every read dies on a
                    # missing path). Leave the live manifest on its
                    # own consistent state instead and say so;
                    # read_table_at_txn applies the same check on the
                    # snapshot-read side.
                    paths = _bucket_paths(t, manifest)
                    gone = [p for p in paths if not os.path.isdir(p)]
                    if gone:
                        log.error(
                            "txn recovery sync for %s skipped: %d/%d "
                            "bucket dirs of the txn snapshot were "
                            "vacuumed; live manifest left unchanged — "
                            "retain more per-table snapshots than the "
                            "txn horizon", t, len(gone), len(paths),
                        )
                        return
                commit_manifest(t, manifest)

        # the sync runs AFTER the commit point: NOTHING here may make
        # the durable transaction look failed (review-found: only lock
        # contention honored this; an OSError from one table's
        # commit_manifest propagated and invited a duplicate commit on
        # caller retry). Any failure is logged and the table converges
        # via the next commit or recover_transactions.
        if not use_locks:
            try:
                _sync_if_not_superseded()
            except Exception:
                log.exception(
                    "txn sync failed for %s after the commit point; "
                    "its manifest lags the txn log until the next "
                    "sync or recover_transactions()", t)
            continue
        for attempt in range(10):
            try:
                with table_write_lock(t):
                    _sync_if_not_superseded()
                break
            except ConcurrentWriteError:
                if attempt == 9:
                    # best-effort, but never SILENT: the staleness
                    # self-heals at the next commit touching this
                    # table (its fence sees the unadvanced mlog) or
                    # via recover_transactions. logging, not
                    # warnings.warn: the default warnings filter
                    # collapses repeats per call site, so only the
                    # FIRST skip would ever surface — every skip must
                    # be on record for the operator
                    log.warning(
                        "txn sync skipped for %s: table lock held "
                        "by a live writer through 10 retries; its "
                        "manifest lags the txn log until the next "
                        "sync or recover_transactions()", t,
                    )
                    break
                time.sleep(0.02 * (attempt + 1))
            except Exception:
                log.exception(
                    "txn sync failed for %s after the commit point; "
                    "its manifest lags the txn log until the next "
                    "sync or recover_transactions()", t)
                break


def read_transaction(
    txn_dir: str, version: int | None = None
) -> dict[str, dict[int, int]]:
    """The committed cross-table state at ``version`` (default:
    latest). Raises KeyError for an unknown version or an empty log."""
    versions = _txn_versions(txn_dir)
    if version is None:
        if not versions:
            raise KeyError(f"no transactions committed in {txn_dir}")
        version = versions[-1]
    p = os.path.join(txn_dir, TXNLOG_NAME, f"{version:08d}.json")
    if not os.path.isfile(p):
        raise KeyError(f"no transaction {version} in {txn_dir} "
                       f"(known: {versions})")
    with open(p) as f:
        payload = json.load(f)
    return {
        t: {int(b): int(e) for b, e in m.items()}
        for t, m in payload["tables"].items()
    }


def recover_transactions(txn_dir: str) -> int | None:
    """Replay the newest committed transaction into every
    participating table's own manifest (idempotent — syncing an
    already-synced table is a no-op). Returns the version replayed,
    or None if no transaction exists. Run at writer startup, like the
    per-table epoch replay."""
    versions = _txn_versions(txn_dir)
    if not versions:
        return None
    # replay the RAW payload so the mlog_at_commit ordering fence rides
    # along — without it, recovery would regress a table that a later
    # single-table commit has already moved past
    p = os.path.join(txn_dir, TXNLOG_NAME, f"{versions[-1]:08d}.json")
    with open(p) as f:
        payload = json.load(f)
    _sync_table_manifests(payload, verify_dirs=True)
    return versions[-1]


def transaction_history(txn_dir: str) -> list[int]:
    """Committed transaction versions, oldest first."""
    return _txn_versions(txn_dir)


def read_table_at_txn(
    spark: SparkSession,
    txn_dir: str,
    table_dir: str,
    version: int | None = None,
) -> DataFrame | None:
    """Read ONE table exactly as the cross-table transaction committed
    it — every table read through the same ``version`` is mutually
    consistent (snapshot isolation across tables). None for a table
    the transaction recorded as empty."""
    if version is None:
        # resolve BEFORE building error messages: the vacuumed-data
        # KeyError below must name the actual version, not "None"
        versions = _txn_versions(txn_dir)
        if not versions:
            raise KeyError(f"no transactions committed in {txn_dir}")
        version = versions[-1]
    state = read_transaction(txn_dir, version)
    key = os.path.abspath(table_dir)
    if key not in state:
        raise KeyError(f"table {table_dir} not part of transaction "
                       f"(tables: {sorted(state)})")
    manifest = state[key]
    if not manifest:
        return None
    paths = _bucket_paths(key, manifest)
    # per-table vacuum retention doesn't know about the txn log: if a
    # vacuum reclaimed this snapshot's directories, fail with the same
    # loud KeyError contract read_pages_table_at gives, not a raw
    # path-not-found mid-scan
    gone = [p for p in paths if not os.path.isdir(p)]
    if gone:
        raise KeyError(
            f"transaction {version}'s data for {table_dir} was vacuumed "
            f"({len(gone)}/{len(paths)} bucket dirs missing); retain more "
            f"per-table snapshots than the txn horizon")
    return read_buckets(spark, key, manifest)
