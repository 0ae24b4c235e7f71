#!/usr/bin/env python
"""sf1 core-scaling legs (r13, VERDICT r12 #6): the sf0.1 8-vs-32-core
ratios all read ≈1 because that bench is overhead-bound (driver planning
+ per-stage scheduling dominate sub-second rows), so the scaling block
could not distinguish a serial query from a tiny one. This harness times
the HEAVIEST sf1 rows at two core counts — one fresh process per leg,
master local[$cores], the bench methodology (1 untimed warm + 3 timed,
median) — and writes SCALE_CORES_SF1.json with per-query ratios
(wall_8 / wall_32; a healthy parallel query approaches the core ratio as
data grows, a fixed-overhead row stays ≈1).

Run:  python scripts/scaling_cores_sf1.py          # both legs
      python scripts/scaling_cores_sf1.py --leg 8  # one leg (internal)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# the heaviest sf1 rows (r12 epoch ordering) — the ones with enough data
# work for core count to matter
ROWS = [
    "tpcds_q49_return_ratio_ranks",
    "dedup_minhash_pairs",
    "tpcds_q64_cross_year_sales",
    "fulltext_query_language",
    "fulltext_hybrid_rrf",
    "fulltext_collapse_by_source",
    "tpcds_q17_sale_return_rebuy_stats",
    "dedup_cluster_canonical",
    "fulltext_bm25_search",
    "graph_pagerank_nations",
    "skew_join_zipf",
    "q5_local_supplier_volume",
]

OUT = REPO / "SCALE_CORES_SF1.json"


def run_leg(cores: int) -> dict[str, float]:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    from sparkfulltextquery_spark import get_spark

    spark = get_spark(app_name=f"scale-cores-sf1-{cores}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import __spark_entry__ as E

    qs = E.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
    out: dict[str, float] = {}
    for name in ROWS:
        import gc

        gc.collect()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        walls.sort()
        out[name] = round(walls[1], 3)
        print(f"[{cores} cores] {name:40s} {out[name]:7.3f}", file=sys.stderr, flush=True)
    return out


def main() -> None:
    if "--leg" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--leg") + 1])
        print(json.dumps(run_leg(cores)))
        return
    legs: dict[str, dict[str, float]] = {}
    for cores in (32, 8):
        p = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "scaling_cores_sf1.py"),
             "--leg", str(cores)],
            capture_output=True, text=True, check=True,
        )
        print(p.stderr, file=sys.stderr)
        legs[str(cores)] = json.loads(p.stdout.strip().splitlines()[-1])
    ratios = {
        n: round(legs["8"][n] / legs["32"][n], 2)
        for n in ROWS
        if legs["32"].get(n)
    }
    result = {"cpus": [32, 8], "sf": 1.0, "walls": legs, "ratio_8_over_32": ratios}
    OUT.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result["ratio_8_over_32"], indent=1))


if __name__ == "__main__":
    main()
