"""Plan-fingerprint ledger: mechanize staleness class (c).

tests/test_driver_queue.py derives staleness classes (a) never-sampled
and (b) oracle-added-after-last-sample mechanically from the
CORRECTNESS_r*.json history, but class (c) — "this query's PLAN changed
since its last green driver row" — used to live in a hand-maintained
comment. This module closes that gap:

* ``canonical_plan(df)`` — the ANALYZED logical plan with run-varying
  noise stripped (expression ids, HOF lambda counters, temp fixture
  paths, uuid sink names, JVM object addresses), so the same query
  text hashes identically across runs, processes, and machines, and
  does not shift when an earlier action executes a cached intermediate
  (see canonical_plan's docstring).
* ``compute_hashes(spark, sf_dir)`` — {query name: sha256 of canonical
  plan} for every registered query.
* ``PLAN_HASHES.json`` (repo root) — the ledger: each query's hash AS
  OF ITS LAST DRIVER-GREEN STATE. tests/test_plan_ledger.py recomputes
  and fails when a query's current hash differs from the ledger while
  the query is absent from ``__spark_entry__._NEVER_DRIVER_VERIFIED``
  — i.e. you cannot change a plan without queueing it for driver
  re-verification.

Round workflow: after a round's CORRECTNESS_r{N}.json lands, run
``python tools/plan_ledger.py --refresh-green CORRECTNESS_r{N}.json``
— it re-pins ONLY the driver-confirmed-green queries and prints which
queue names can drain; a bare ``python tools/plan_ledger.py`` re-pins
everything (use only when every registered query is driver-clean at
its current plan). Mid-round, any plan edit trips the test until the
query is queued.

Limits (documented, not hidden): queries whose registered callable runs
its real work at CONSTRUCTION time (the streaming e2e family returns a
batch read of results a stream already wrote) fingerprint only the
final read-back plan — edits to their foreachBatch bodies are invisible
here and stay covered by class-(a/b) plus the per-operator unit tests.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER_PATH = os.path.join(REPO, "PLAN_HASHES.json")
SF_DIR = "/root/testdata/sf0.001"

_EXPR_ID = re.compile(r"#\d+")
# NamedLambdaVariable suffixes (``lambda x_123#``) come from a
# PROCESS-GLOBAL counter: constructing one more lambda anywhere earlier
# in the process shifts every later query's variable names, so an
# unrelated edit would cascade hash changes across the whole HOF-using
# registry (observed: 14 FTS/search/crossdoc hashes moved when the
# crawl fixture changed). Strip the counter after _EXPR_ID runs.
_LAMBDA_SEQ = re.compile(r"_\d+#")
_ADDR = re.compile(r"@[0-9a-f]{6,}")
_TMP = re.compile(r"(?:file:)?/(?:tmp|var/folders)/\S+")
_SPARK_WH = re.compile(r"(?:file:)?\S*/spark-warehouse/\S*")
_PLAN_ID = re.compile(r"plan_id=\d+")
# memory-sink table names carry a per-construction uuid suffix
# (``neardup_e2e_3fa9c1d2`` — queries_pipeline.py's streaming family):
# random text that would make every cross-process hash differ
_HEX_SUFFIX = re.compile(r"_[0-9a-f]{8,32}\b")
# parquet split sizes / statistics can vary with the writing session
_SIZE_HINT = re.compile(r"Statistics\([^)]*\)")


def canonical_plan(df) -> str:
    """ANALYZED logical plan text with run-varying tokens stripped.

    Analyzed, not optimized (round-11 fix): the optimizer substitutes
    cached intermediates with InMemoryRelation nodes whose text embeds
    the cached PHYSICAL plan — including its AdaptiveSparkPlan, whose
    rendering changes from `isFinalPlan=false` to a full Final/Initial
    dump once any earlier action executes the cache (observed:
    dedup_minhash_lsh hashed differently after test_oracle_parity ran
    it). The analyzed plan never embeds cache or execution state, and
    still changes whenever OUR construction changes — which is the
    only change class the ledger exists to detect (optimizer-behavior
    shifts come from the Spark version, pinned by the environment)."""
    text = df._jdf.queryExecution().analyzed().toString()
    text = _EXPR_ID.sub("#", text)
    text = _LAMBDA_SEQ.sub("_#", text)
    text = _ADDR.sub("@", text)
    text = _TMP.sub("<TMP>", text)
    text = _SPARK_WH.sub("<WAREHOUSE>", text)
    text = _PLAN_ID.sub("plan_id=", text)
    text = _SIZE_HINT.sub("Statistics(<*>)", text)
    text = _HEX_SUFFIX.sub("_<uuid>", text)
    return text


def plan_hash(df) -> str:
    return hashlib.sha256(canonical_plan(df).encode()).hexdigest()[:16]


def compute_hashes(spark, sf_dir: str = SF_DIR, names=None) -> dict:
    """{name: hash} for every registered query (or the given subset).

    A query whose construction raises is recorded as ``ERROR:<type>`` —
    the ledger test surfaces it rather than silently skipping.
    """
    import __spark_entry__ as E

    out: dict[str, str] = {}
    qs = E.queries()
    for name, fn in qs.items():
        if names is not None and name not in names:
            continue
        try:
            out[name] = plan_hash(fn(spark, sf_dir))
        except Exception as exc:  # surfaced by the test, never hidden
            out[name] = f"ERROR:{type(exc).__name__}"
    return dict(sorted(out.items()))


def load_ledger() -> dict:
    if not os.path.exists(LEDGER_PATH):
        return {}
    with open(LEDGER_PATH) as fh:
        return json.load(fh)


def save_ledger(hashes: dict) -> None:
    with open(LEDGER_PATH, "w") as fh:
        json.dump(hashes, fh, indent=1, sort_keys=True)
        fh.write("\n")


def main() -> None:
    import sys

    if REPO not in sys.path:  # `python tools/plan_ledger.py` puts
        sys.path.insert(0, REPO)  # tools/ on the path, not the repo root
    # MUST be the project session factory, not a bare builder: session
    # configs that change optimized-plan TEXT (ANSI cast nodes, the UTC
    # timezone on timestamp literals) would otherwise make generator
    # and pytest hashes disagree on ~half the registry (observed)
    from crawler_spark.session import get_spark

    spark = get_spark("plan-ledger", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    if "--refresh-green" in sys.argv:
        # round-start workflow: re-pin ONLY the queries the given
        # driver CORRECTNESS file confirmed green (hash_match, or
        # rows+schema for rows-only checks), then report which queue
        # names are safe to drain. Never silently re-pins an
        # unverified plan change — that is the whole point of the
        # ledger.
        corr_path = sys.argv[sys.argv.index("--refresh-green") + 1]
        with open(corr_path) as fh:
            corr = json.load(fh)
        green = {
            n for n, row in corr.items()
            if row.get("err") is None
            and (row.get("hash_match")
                 or (row.get("rows_match") and row.get("schema_match")))
        }
        hashes = compute_hashes(spark, names=green)
        ledger = load_ledger()
        repinned = sorted(
            n for n in hashes
            if not hashes[n].startswith("ERROR") and ledger.get(n) != hashes[n]
        )
        for n in repinned:
            ledger[n] = hashes[n]
        save_ledger(dict(sorted(ledger.items())))
        print(f"re-pinned {len(repinned)} driver-green plans: "
              f"{repinned[:20]}")
        print("queue names now safe to drain from _NEVER_DRIVER_VERIFIED: "
              f"{sorted(green)[:30]}")
        return

    hashes = compute_hashes(spark)
    old = load_ledger()
    changed = {n for n in hashes if old.get(n) != hashes[n]}
    save_ledger(hashes)
    print(f"pinned {len(hashes)} plans -> {LEDGER_PATH} "
          f"({len(changed)} changed: {sorted(changed)[:20]})")


if __name__ == "__main__":
    main()
