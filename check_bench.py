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
the check estimates machine drift as the MEDIAN cur/gate ratio over a
fixed CANARY set of code-stable pure-scan/cheap-expression queries —
NOT over all gated queries, since a fleet-wide code regression (e.g. a
bad global Spark config) would move the all-query median and launder
itself as drift; the canaries touch no operator code that plausibly
regresses together with the rest of the suite. The drift factor is
capped at 2× and never below 1× and is printed so every run's
environment is on record. A secondary absolute gate on total suite
wall-clock (2× drift-scaled sum of gates) backstops any remaining
laundering: many small sub-2× regressions still trip the total.

Usage: python bench.py && python check_bench.py
New queries (no gate yet) are reported informationally and pass.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# Code-stable drift canaries: projected parquet scans and trivial
# JVM-expression queries whose plans have been frozen since round 2.
# A config-level fleet regression would slow these too — but then the
# drift print itself IS the finding, and the absolute total gate below
# still fires because every other query pays the same factor on top.
CANARIES = [
    "s1_scan_projected", "web_pages_listing", "sample_deterministic",
    "shard_assignment", "txt_fingerprint", "v3_truncate_or_pad",
    "setop_intersect", "setop_except", "url_normalize_dedup",
    "q6_forecast_revenue",
]


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    mid = len(xs) // 2
    return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2


def main() -> int:
    gates = json.load(open(os.path.join(HERE, "BENCH_GATES.json")))
    bench = json.load(open(os.path.join(HERE, "BENCH_FULL.json")))
    timings = bench["queries"]

    canary_ratios = [
        timings[name] / gates[name]
        for name in CANARIES
        if name in timings and name in gates
        and timings[name] >= 0 and gates[name] > 0
    ]
    all_ratios = [
        sec / gates[name]
        for name, sec in timings.items()
        if name in gates and sec >= 0 and gates[name] > 0
    ]
    # Anchor on canaries when enough of them ran; fall back to the
    # all-query median only for partial runs missing the canary set.
    basis, anchored = (canary_ratios, "canary") if len(canary_ratios) >= 3 \
        else (all_ratios, "all-query")
    drift = min(2.0, max(1.0, _median(basis))) if basis else 1.0

    breaches, new, failed = [], [], []
    for name, sec in sorted(timings.items()):
        if sec < 0:
            failed.append(name)
        elif name not in gates:
            new.append(name)
        elif sec > 2.0 * drift * gates[name]:
            breaches.append((name, sec, gates[name]))

    print(f"machine drift factor (median cur/best over {len(basis)} "
          f"{anchored} queries, capped to [1, 2]): {drift:.2f}")
    if all_ratios:
        print(f"  (all-query median for reference: "
              f"{_median(all_ratios):.2f})")
    for name, sec, gate in breaches:
        print(f"BREACH {name}: {sec:.2f}s > 2x drift-scaled gate "
              f"{drift * gate:.2f}s ({sec / gate:.2f}x raw)")
    for name in failed:
        print(f"FAILED {name}: rc != 0 in bench run")
    if new:
        print(f"new (ungated, pass): {', '.join(new)}")

    # Absolute backstop: total wall over the gated subset vs the
    # drift-scaled sum of those gates. Catches a fleet of sub-2×
    # regressions that no per-query gate trips individually.
    gated_total = sum(sec for name, sec in timings.items()
                      if name in gates and sec >= 0)
    gate_total = sum(gates[name] for name, sec in timings.items()
                     if name in gates and sec >= 0)
    total_ok = gated_total <= 2.0 * drift * gate_total if gate_total else True
    print(f"total gated wall: {gated_total:.1f}s vs 2x drift-scaled "
          f"sum-of-gates {2.0 * drift * gate_total:.1f}s "
          f"[{'ok' if total_ok else 'BREACH'}]")
    # Headline comparator (BASELINE.md §C, round-12 policy): the raw
    # sum-of-gates is a best-EVER composite no single run attains (each
    # gate is its query's historical best, recorded across eras), so
    # the number a reader should compare runs by is the drift-ADJUSTED
    # total — attainable, era-portable, and 1.0x means "as fast as the
    # recorded bests after removing machine speed".
    if gate_total:
        print(f"drift-adjusted composite: {gated_total / drift:.1f}s vs "
              f"sum-of-gates {gate_total:.1f}s = "
              f"{gated_total / drift / gate_total:.2f}x")
    print(f"checked {len(timings)} queries: {len(breaches)} breaches, "
          f"{len(failed)} failures, {len(new)} new")
    return 1 if (breaches or failed or not total_ok) else 0


if __name__ == "__main__":
    sys.exit(main())
