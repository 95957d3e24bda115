#!/usr/bin/env python
"""Mechanical ≤2× bench gate: compare BENCH_FULL.json (written by
bench.py) against BENCH_GATES.json (best-known per-query seconds across
recorded rounds, see BASELINE.md §C). Prints one line per breach and a
summary; exit 1 on any breach.

The gate is drift-normalized: recorded bests come from whatever machine
state past rounds ran under, and a shared box drifts wall-clock speed
round to round (observed: a uniform 1.5× slowdown hitting 0.1-second
scans and 10-second joins alike). A per-query 2× check against the
all-time best would then fire fleet-wide on environment, not code. So
the check first estimates machine drift as the MEDIAN cur/gate ratio
over all gated queries — robust to a handful of genuine regressions,
which cannot move the median of ~180 queries — and flags queries
exceeding 2× the drift-scaled gate. The drift factor is capped at 2×
and never below 1× so a broadly broken build cannot launder itself as
a slow machine, and is printed so every run's environment is on record.

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

    ratios = sorted(
        sec / gates[name]
        for name, sec in timings.items()
        if name in gates and sec >= 0 and gates[name] > 0
    )
    drift = 1.0
    if ratios:
        mid = len(ratios) // 2
        med = (ratios[mid] if len(ratios) % 2
               else (ratios[mid - 1] + ratios[mid]) / 2)
        drift = min(2.0, max(1.0, med))

    breaches, new, failed = [], [], []
    for name, sec in sorted(timings.items()):
        if sec < 0:
            failed.append(name)
        elif name not in gates:
            new.append(name)
        elif sec > 2.0 * drift * gates[name]:
            breaches.append((name, sec, gates[name]))

    print(f"machine drift factor (median cur/best over {len(ratios)} "
          f"gated queries, capped to [1, 2]): {drift:.2f}")
    for name, sec, gate in breaches:
        print(f"BREACH {name}: {sec:.2f}s > 2x drift-scaled gate "
              f"{drift * gate:.2f}s ({sec / gate:.2f}x raw)")
    for name in failed:
        print(f"FAILED {name}: rc != 0 in bench run")
    if new:
        print(f"new (ungated, pass): {', '.join(new)}")
    print(f"checked {len(timings)} queries: {len(breaches)} breaches, "
          f"{len(failed)} failures, {len(new)} new")
    return 1 if (breaches or failed) else 0


if __name__ == "__main__":
    sys.exit(main())
