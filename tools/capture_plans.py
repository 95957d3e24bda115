#!/usr/bin/env python
"""Capture .explain("formatted") output for named queries into
plans/r12/<query>_<tag>.txt — the optimization-round evidence trail
(guide §1: record the plan shape before and after each change).

Usage:
    python tools/capture_plans.py before q1 q2 ...
    python tools/capture_plans.py after q1 q2 ...
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = sys.argv[1]
    names = sys.argv[2:]

    from crawler_spark.plans import registry
    from crawler_spark.session import get_spark

    spark = get_spark("capture_plans", cpus=8)
    registry.load_all()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("PLANS_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:
            plan = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
