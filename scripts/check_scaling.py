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

`--sf10` (r8, VERDICT r07 #7) gates the THIRD decade instead: ratios of
BENCH_SF10_LOCAL.json over BENCH_SF1_LOCAL.json (sf1 -> sf10, another
10x), same taxonomy — the headline set + 15 heaviest rows measured
across sf0.1 -> sf1 -> sf10 turns the "100x-safe" claim into three
measured decades.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Documented super-linear classes (r8, surfaced by the first sf10 run —
# the third decade doing exactly its job). Each entry is
# (max_ratio_per_decade, reason); a row here classifies KNOWN instead of
# ALARM while it stays UNDER its documented bound — past the bound it
# still alarms. These are data/asymptotics facts, not implementation
# passes:
#   dedup_minhash_pairs — the row's OUTPUT is all verified near-dup
#     pairs: on the replicated scaling corpus every doc's duplicate
#     group grows 10x per decade, so intra-group pairs grow ~110x
#     (measured: 250,600 -> 27,310,000 rows sf1->sf10 = 109x) while
#     wall grew only 26x — sublinear in its own output. Any engine
#     emitting all pairs pays output cardinality; the scale path for
#     high-duplication corpora is dedup_cluster_canonical (min-
#     representative, O(group) not O(group^2); measured 1.6x/decade on
#     the same data).
#   dedup_semdedup_prune — exact SemDeDup with k = sqrt(n) clusters is
#     the brute-force optimum: assignment O(n*k) + within-cluster pairs
#     O(n^2/k) minimize jointly at O(n^1.5) => 10^1.5 ~= 31.6x/decade
#     theoretical; measured 18.9x. At 100 TB the IVF/ANN path replaces
#     exact assignment (similarity/__init__.py) — documented there.
KNOWN_SUPERLINEAR = {
    "dedup_minhash_pairs": (120.0, "output-bound: pairs grow ~110x/decade"),
    "dedup_semdedup_prune": (35.0, "O(n^1.5) exact-pairing optimum"),
}

# JVM-state-noisy rows (r10, ADVICE r09): textstats_quality is
# intrinsically LINEAR (staged per-document scalar columns) but its
# in-suite wall is the most heap-history-sensitive in the bench — at one
# commit it measured 31.2s / 42.6s / 53.7s at sf10 depending on what ran
# before it (it follows the 27M-pair minhash row), swinging the in-suite
# ratio across the 12x line. r9 widened its KNOWN bound to 16x, which
# ADVICE correctly flagged as masking a real sub-2x regression. r10
# instead gates these rows on their FRESH-JVM isolated walls
# (scripts/bench_isolated.py -> BENCH_ISOLATED.json, one process per
# measurement) at the STANDARD 12x line — heap noise is excluded by
# construction, so the bound needs no slack. If the sidecar is missing
# for either scale the row falls back to plain ALARM classification (the
# gate never silently loosens).
#
# r11 generalization: the sidecar check now applies to ANY alarming row
# with isolated walls committed at both scales (the r11 bench host
# evicts page cache mid-run — scan-bound sf10 rows flip-flop 4-17x
# between legs at identical code; fresh-JVM isolated walls are immune).
# This set remains as documentation of which rows have NEEDED it.
ISOLATED_GATED = {
    "textstats_quality",            # heap-history-sensitive (r10)
    "tpcds_q67_rollup_rank",        # cache-reclaim-sensitive (r11)
    "fulltext_simple_query_indexed",        # cache-reclaim (r11)
    "fulltext_query_phrase_prefix_indexed", # cache-reclaim (r11)
    "textstats_gopher_repetition",          # cache-reclaim (r11)
}


def _isolated_ratio(name: str, scales: tuple[str, str]) -> float | None:
    path = REPO / "BENCH_ISOLATED.json"
    if not path.exists():
        return None
    data = json.loads(path.read_text()).get(name, {})
    lo, hi = data.get(scales[0]), data.get(scales[1])
    if lo is None or hi is None:
        return None
    return hi / max(lo, 0.001)


def main() -> int:
    if "--sf10" in sys.argv:
        a = json.loads((REPO / "BENCH_SF1_LOCAL.json").read_text())
        b = json.loads((REPO / "BENCH_SF10_LOCAL.json").read_text())
        scales = ("1", "10")
    else:
        a = json.loads((REPO / "BENCH_LOCAL.json").read_text())
        b = json.loads((REPO / "BENCH_SF1_LOCAL.json").read_text())
        scales = ("0.1", "1")
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
            if cls == "ALARM":
                # any row with committed fresh-JVM isolated walls at BOTH
                # scales classifies on that ratio (r11 — generalized from
                # the hardcoded textstats set): measuring a row with
                # bench_isolated.py is a deliberate, committed, auditable
                # act, and the isolated wall is strictly the more honest
                # number when in-suite walls carry heap history or page-
                # cache reclaim (the r11 host evicts cache mid-run; see
                # SCALE.md r11 bench note). A row with no sidecar data
                # still alarms — the gate never silently loosens.
                iso = _isolated_ratio(k, scales)
                if iso is not None and iso <= 12:
                    cls = f"ISO(fresh-JVM ratio {iso:.1f}x <= 12)"
            if cls == "ALARM" and k in KNOWN_SUPERLINEAR:
                bound, reason = KNOWN_SUPERLINEAR[k]
                if r <= bound:
                    cls = f"KNOWN({reason})"
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
