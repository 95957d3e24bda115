"""Meta-test: the driver sampler queue in __spark_entry__.py must not
go stale.

Round 9's verdict found the queue still held the SPENT round-9 list, so
the driver would have burned its 50 sample slots re-verifying green
queries while the 9 actually-unverified queries starved. Two of the
three staleness classes are mechanically derivable from the committed
CORRECTNESS_r*.json history, so this test enforces them:

  (a) a registered query that has NEVER appeared in any driver
      CORRECTNESS file must be queued;
  (b) a query whose LATEST driver row is not a hash-pass (e.g. sampled
      as ``no_oracle`` before its oracle existed) but which is now
      oracle-backed must be queued.

Class (c) — the plan changed since the last green row — cannot be
derived from the history; since round 11 it is enforced by the
PLAN_HASHES.json ledger (tools/plan_ledger.py + tests/
test_plan_ledger.py: a query whose canonicalized analyzed plan
differs from its pinned hash must be queued). Extra names in the
queue (already-green queries queued for re-verification) are allowed.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_driver_rows() -> dict[str, dict]:
    """Latest CORRECTNESS row per query, in round order."""
    rows: dict[str, dict] = {}
    files = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    for path in files:
        with open(path) as fh:
            for name, row in json.load(fh).items():
                rows[name] = row
    return rows


def _load():
    import __spark_entry__ as entry
    from crawler_spark.plans import registry

    registry.load_all()
    return entry, registry


def test_queue_names_are_registered():
    """Every queued name must be a real registry entry (no typos, no
    names left behind after a rename)."""
    entry, registry = _load()
    unknown = [n for n in entry._NEVER_DRIVER_VERIFIED
               if n not in registry.QUERIES]
    assert not unknown, f"queued but not registered: {unknown}"


def test_never_sampled_queries_are_queued():
    """Class (a): anything the driver has never seen must be queued."""
    entry, registry = _load()
    seen = _latest_driver_rows()
    missing = [n for n in registry.QUERIES
               if n not in seen and n not in entry._NEVER_DRIVER_VERIFIED]
    assert not missing, (
        "registered queries never driver-sampled and not queued: "
        f"{missing}"
    )


def test_oracle_added_after_last_sample_is_queued():
    """Class (b): latest driver row is not a hash-pass, but the query
    is now oracle-backed — it needs a fresh sample."""
    entry, registry = _load()
    seen = _latest_driver_rows()
    stale = [
        n for n, row in seen.items()
        if n in registry.ORACLE
        and row.get("hash_match") is not True
        and n in registry.QUERIES
        and n not in entry._NEVER_DRIVER_VERIFIED
    ]
    assert not stale, (
        "oracle-backed queries whose latest driver row is not a "
        f"hash-pass and which are not queued: {stale}"
    )
