#!/usr/bin/env python
"""Standing sf0.1 → sf1 scaling gate (VERDICT r05 #3).

Reads the two committed bench artifacts (BENCH_LOCAL.json from
`python bench.py`, BENCH_SF1_LOCAL.json from `python bench.py --sf1`)
and classifies every query's wall-time ratio across the decade
(10× data):

  ratio <= 3.5   OK        fixed-/index-cost dominated (pruned index
                           lookups, dimension-bounded aggregates)
  3.5 < r <= 12  LINEAR    marginal-cost dominated — a per-row scan
                           growing ~10× with 10× data is the HEALTHY
                           shape at scale (it parallelizes); flagged
                           for visibility, not failure
  ratio > 12     ALARM     super-linear — something recomputes, spills,
                           or degrades with data size; exit 1

The r5 sf1 run surfaced exactly one real bug class this gate exists for
(repeated-expression recompute, textstats_quality); the classification
keeps that signal while not crying wolf on every scan-bound per-document
query (whose near-10× ratio is expected and correct).

Run per round:
    python bench.py && python bench.py --sf1 && python scripts/check_scaling.py
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    a = json.loads((REPO / "BENCH_LOCAL.json").read_text())
    b = json.loads((REPO / "BENCH_SF1_LOCAL.json").read_text())
    rows = []
    for section in ("queries", "extra"):
        for k, v1 in b.get(section, {}).items():
            v0 = a.get(section, {}).get(k)
            if v0 is None:
                continue
            # a 0.000-rounded sf0.1 wall must not silently skip the query —
            # an "infinitely super-linear" row is exactly what this gate
            # exists to catch; floor the denominator at the 1ms rounding
            # granularity instead
            r = v1 / max(v0, 0.001)
            cls = "OK" if r <= 3.5 else ("LINEAR" if r <= 12 else "ALARM")
            rows.append((cls, r, k, v0, v1))
    if not rows:
        print(
            "ALARM  no overlapping query names between BENCH_LOCAL.json and "
            "BENCH_SF1_LOCAL.json — stale artifact? rerun both bench modes"
        )
        return 1
    rows.sort(key=lambda t: -t[1])
    width = max(len(k) for _, _, k, _, _ in rows)
    alarms = 0
    for cls, r, k, v0, v1 in rows:
        print(f"{cls:6} {k:{width}} {v0:8.3f}s -> {v1:8.3f}s  ({r:4.1f}x /decade)")
        alarms += cls == "ALARM"
    print(f"\n{len(rows)} queries; {alarms} super-linear alarm(s)")
    return 1 if alarms else 0


if __name__ == "__main__":
    sys.exit(main())
