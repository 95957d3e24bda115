"""Smoke tests mirroring the driver's t1 check: entry() runs and
returns rows with a stable schema."""

import __spark_entry__ as E


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "distance", "url", "snippet"}
    # distances ascend (top-k by similarity)
    dists = [r.distance for r in rows]
    assert dists == sorted(dists)


def test_queries_and_oracle_keys_align():
    q = E.queries()
    o = E.oracle_sql()
    # every oracle key must have a query; queries without oracle are
    # allowed (rows-only checks) but not vice versa
    assert set(o) <= set(q)
