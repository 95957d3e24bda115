#!/usr/bin/env python
"""Per-query profiler for the bench suite (optimization rounds).

Runs the named queries (or the N slowest from BENCH_FULL.json) exactly
as bench.py does (noop sink), but additionally records, per query:
job count, stage count, task count (via the status tracker) and wall
seconds. High job/stage counts against tiny sf data mean the query is
scheduling-overhead bound, not compute bound — the first split the
optimization guide asks for (guide §1).

Usage:
    python tools/profile_bench.py q1 q2 ...      # profile named queries
    python tools/profile_bench.py --top 15       # N slowest per BENCH_FULL
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from crawler_spark.plans import registry
    from crawler_spark.session import get_spark

    spark = get_spark("profile", cpus=cpus)
    registry.load_all()

    args = sys.argv[1:]
    if args and args[0] == "--top":
        n = int(args[1]) if len(args) > 1 else 15
        full = json.load(open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_FULL.json")))
        names = [k for k, _ in sorted(
            full["queries"].items(), key=lambda kv: -kv[1])[:n]]
    else:
        names = args
    unknown = [n for n in names if n not in registry.QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    from crawler_spark.sources import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    from crawler_spark.plans.queries_pipeline import _fixture_crawl_items

    _fixture_crawl_items(spark)

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    rows = []
    for name in names:
        fn = registry.QUERIES[name]
        group = f"profile_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        t_build = None
        try:
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"{name} FAILED: {exc}", file=sys.stderr)
            continue
        finally:
            sc.setJobGroup(None, None)
        wall = time.perf_counter() - t0
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = n_tasks = 0
        for j in job_ids:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        rows.append({
            "query": name, "wall_s": round(wall, 3),
            "build_s": round(t_build, 3) if t_build is not None else None,
            "jobs": len(job_ids), "stages": n_stages, "tasks": n_tasks,
        })
        print(json.dumps(rows[-1]), flush=True)

    print("\n== summary (slowest first) ==")
    for r in sorted(rows, key=lambda r: -r["wall_s"]):
        print(f"{r['wall_s']:8.2f}s  build={r['build_s']:7.2f}s "
              f"jobs={r['jobs']:4d} stages={r['stages']:5d} "
              f"tasks={r['tasks']:6d}  {r['query']}")


if __name__ == "__main__":
    main()
