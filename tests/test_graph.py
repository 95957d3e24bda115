"""PageRank operator tests: closed-form graphs, a pure-Python power
iteration as the value oracle, and mass conservation with dangling
nodes."""

from __future__ import annotations

from crawler_spark.operators.graph import pagerank


def _py_pagerank(edges, d=0.85, iters=10):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = {}
    dedup = sorted(set(edges))
    for s, _t in dedup:
        out[s] = out.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r[v] for v in nodes if v not in out)
        nxt = {v: (1 - d) / n + d * dangling / n for v in nodes}
        for s, t in dedup:
            nxt[t] += d * r[s] / out[s]
        r = nxt
    return {v: round(x, 6) for v, x in r.items()}


def test_cycle_is_uniform(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long")
    got = {r.id: r.rank for r in pagerank(edges).collect()}
    assert got == {1: round(1 / 3, 6), 2: round(1 / 3, 6), 3: round(1 / 3, 6)}


def test_matches_python_reference_with_dangling(spark):
    # node 4 is dangling; duplicate edge (1,2) must count once
    raw = [(1, 2), (1, 2), (1, 3), (2, 4), (3, 4), (2, 3)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(edges).collect()}
    want = _py_pagerank(raw)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 2e-6, (v, got[v], want[v])


def test_total_mass_conserved(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 5)], "src long, dst long")
    total = sum(r.rank for r in pagerank(edges, iterations=5).collect())
    assert abs(total - 1.0) < 1e-4


def test_convergence_stop_is_early_and_value_preserving(spark):
    # a 3-cycle's uniform start IS the fixed point: delta hits 0 after
    # the first round, so the tol path must exit long before the ceiling
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long")
    stats: dict = {}
    early = {r.id: r.rank
             for r in pagerank(edges, iterations=10, stats=stats).collect()}
    assert stats["iterations_run"] < 10
    fixed = {r.id: r.rank
             for r in pagerank(edges, iterations=10, tol=0).collect()}
    assert early == fixed

    # non-trivial graph: early-exit result equals the fixed-count result
    # after the 6-decimal rounding, and tol=0 really runs the ceiling
    raw = [(1, 2), (1, 3), (2, 4), (3, 4), (2, 3), (4, 1)]
    g = spark.createDataFrame(raw, "src long, dst long")
    stats2: dict = {}
    early2 = {r.id: r.rank
              for r in pagerank(g, iterations=60, stats=stats2).collect()}
    stats3: dict = {}
    fixed2 = {r.id: r.rank
              for r in pagerank(g, iterations=60, tol=0, stats=stats3).collect()}
    assert stats3["iterations_run"] == 60
    assert stats2["iterations_run"] < 60  # data-dependent, not the ceiling
    assert early2 == fixed2


def test_hub_outranks_leaves(spark):
    # star: everyone links to 0
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)], "src long, dst long")
    rows = {r.id: r.rank for r in pagerank(edges).collect()}
    assert rows[0] == max(rows.values())
    leaf_ranks = {v for k, v in rows.items() if k != 0}
    assert len(leaf_ranks) == 1  # symmetric leaves tie exactly
