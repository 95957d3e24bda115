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


# --- HITS -----------------------------------------------------------------
from crawler_spark.operators.graph import hits  # noqa: E402


def _py_hits(edges, iters=20):
    nodes = sorted({u for e in edges for u in e})
    dedup = sorted(set(edges))
    h = {v: 1.0 for v in nodes}
    a = {v: 1.0 for v in nodes}
    for _ in range(iters):
        a = {v: sum(h[s] for s, t in dedup if t == v) for v in nodes}
        nrm = sum(x * x for x in a.values()) ** 0.5
        a = {v: (x / nrm if nrm else 0.0) for v, x in a.items()}
        h = {v: sum(a[t] for s, t in dedup if s == v) for v in nodes}
        nrm = sum(x * x for x in h.values()) ** 0.5
        h = {v: (x / nrm if nrm else 0.0) for v, x in h.items()}
    return (
        {v: round(x, 6) for v, x in h.items()},
        {v: round(x, 6) for v, x in a.items()},
    )


def test_hits_matches_python_reference(spark):
    # a directory page (1) linking to three content pages, one of which
    # (4) is also endorsed by 2 and 3; duplicate edge counts once
    raw = [(1, 2), (1, 3), (1, 4), (2, 4), (3, 4), (1, 4)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    got = {r.id: (r.hub, r.authority) for r in hits(edges, tol=0).collect()}
    wh, wa = _py_hits(raw)
    assert set(got) == set(wh)
    for v in wh:
        assert abs(got[v][0] - wh[v]) < 2e-6, ("hub", v, got[v][0], wh[v])
        assert abs(got[v][1] - wa[v]) < 2e-6, ("auth", v, got[v][1], wa[v])


def test_hits_identifies_hub_and_authority(spark):
    raw = [(1, 2), (1, 3), (1, 4), (2, 4), (3, 4)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    got = {r.id: r for r in hits(edges).collect()}
    # 1 is the best hub (links all content); 4 the best authority
    assert got[1].hub == max(r.hub for r in got.values())
    assert got[4].authority == max(r.authority for r in got.values())
    # pure hub has no in-links -> zero authority; pure sink no hub
    assert got[1].authority == 0.0
    assert got[4].hub == 0.0


def test_hits_early_exit_preserves_values(spark):
    raw = [(1, 2), (1, 3), (2, 3), (3, 1)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    stats = {}
    fixed = {
        (r.id, r.hub, r.authority)
        for r in hits(edges, iterations=30, tol=0).collect()
    }
    early = {
        (r.id, r.hub, r.authority)
        for r in hits(edges, iterations=30, tol=1e-7, stats=stats).collect()
    }
    assert early == fixed
    assert stats["iterations_run"] < 30
