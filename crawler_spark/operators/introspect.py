"""Post-execution plan introspection: per-node SQLMetric values.

"Measure, don't guess" as a library call: after a query runs, every
physical operator holds its SQLMetrics (output rows, shuffle bytes,
spill, scan file counts). This walks the executed plan over py4j —
unwrapping the AQE root and materialized query stages — and returns
them as plain rows, so the same engine that runs the query can report
where its rows and bytes actually went. That is the signal that says
"this join built a 10 GB hash relation" or "this scan read 400
columns" BEFORE the 100 TB run does; the plan-shape lock tests assert
the shapes we designed, this reports the numbers those shapes produce.

Driver-side only by nature (the metrics live in the driver's plan
tree); cost is O(plan nodes), independent of data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan_metrics(df: DataFrame) -> list[tuple[int, str, str, int]]:
    """(depth, node, metric, value) for every metric on the EXECUTED
    plan of ``df``. The frame must have been materialized through its
    own query execution (``collect()``/``toPandas()``) — a fresh or
    differently-executed frame reports zeros."""
    plan = df._jdf.queryExecution().executedPlan()
    if plan.nodeName() == "AdaptiveSparkPlan":
        plan = plan.finalPhysicalPlan()
    out: list[tuple[int, str, str, int]] = []

    def walk(node, depth: int) -> None:
        name = node.nodeName()
        if name.endswith("QueryStage"):
            # materialized AQE stage: the real subtree hangs off .plan()
            walk(node.plan(), depth)
            return
        mets = node.metrics()
        it = mets.iterator()
        while it.hasNext():
            kv = it.next()
            out.append((depth, name, kv._1(), int(kv._2().value())))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), depth + 1)

    walk(plan, 0)
    return out


def profile_query(df: DataFrame) -> list[tuple[int, str, str, int]]:
    """Materialize ``df`` through its own execution, then report its
    metrics. Uses ``collect()`` because that is the one action that
    runs THIS frame's query execution (count()/noop-write plan a new
    tree whose metrics this frame never sees) — profile aggregated /
    bounded outputs, not raw scans."""
    df.collect()
    return executed_plan_metrics(df)
