#!/usr/bin/env python
"""Mechanical ≤2× bench gate: compare BENCH_FULL.json (written by
bench.py) against BENCH_GATES.json (best-known per-query seconds across
recorded rounds, see BASELINE.md §C). Prints one line per breach and a
summary; exit 1 on any breach.

Usage: python bench.py && python check_bench.py
New queries (no gate yet) are reported informationally and pass.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    gates = json.load(open(os.path.join(HERE, "BENCH_GATES.json")))
    bench = json.load(open(os.path.join(HERE, "BENCH_FULL.json")))
    timings = bench["queries"]

    breaches, new, failed = [], [], []
    for name, sec in sorted(timings.items()):
        if sec < 0:
            failed.append(name)
        elif name not in gates:
            new.append(name)
        elif sec > 2.0 * gates[name]:
            breaches.append((name, sec, gates[name]))

    for name, sec, gate in breaches:
        print(f"BREACH {name}: {sec:.2f}s > 2x gate {gate:.2f}s "
              f"({sec / gate:.2f}x)")
    for name in failed:
        print(f"FAILED {name}: rc != 0 in bench run")
    if new:
        print(f"new (ungated, pass): {', '.join(new)}")
    print(f"checked {len(timings)} queries: {len(breaches)} breaches, "
          f"{len(failed)} failures, {len(new)} new")
    return 1 if (breaches or failed) else 0


if __name__ == "__main__":
    sys.exit(main())
