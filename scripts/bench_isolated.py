#!/usr/bin/env python
"""Fresh-JVM isolated wall measurement for JVM-state-noisy bench rows.

`check_scaling.py` gates most rows on the in-suite bench artifacts, but a
handful of rows are wall-sensitive to the heap state the PRECEDING rows
leave behind (textstats_quality measured 31-54s at sf10 at the same
commit depending on what ran before it). For those rows the honest gate
is the intrinsic fresh-JVM cost, not the in-suite wall — this script
measures it: one query per PROCESS (so the JVM, codegen caches and heap
are all cold-started), 1 untimed warm run + 3 timed, median recorded.

Usage (run once per scale for each row in check_scaling.ISOLATED_GATED):

    python scripts/bench_isolated.py textstats_quality --scale 0.1
    python scripts/bench_isolated.py textstats_quality --scale 1
    python scripts/bench_isolated.py textstats_quality --scale 10

Results merge into BENCH_ISOLATED.json at the repo root:

    {"textstats_quality": {"0.1": 3.1, "1": 3.4, "10": 27.7}}

check_scaling.py then classifies the row on the ISOLATED ratio with the
standard 12x super-linear line — no widened in-suite bound needed.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SCALE_DIRS = {
    "0.1": ("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1", None),
    "1": ("SPARK_GRAFT_SF1_DIR", "/tmp/sf1", "make_sf1.py"),
    "10": ("SPARK_GRAFT_SF10_DIR", "/tmp/sf10", "make_sf10.py"),
}
# same measured heap sweet spots as bench.py's decade modes
SCALE_HEAP = {"0.1": 8, "1": 16, "10": 32}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--scale", choices=sorted(SCALE_DIRS), default="0.1")
    args = ap.parse_args()

    env_var, default_dir, build_script = SCALE_DIRS[args.scale]
    sf_dir = os.environ.get(env_var, default_dir)
    if not Path(f"{sf_dir}/lineitem.parquet").exists():
        if build_script is None:
            raise SystemExit(f"dataset missing at {sf_dir}")
        import subprocess

        subprocess.run(
            [sys.executable, str(REPO / "scripts" / build_script)],
            check=True,
            stdout=sys.stderr,
        )

    import bench

    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_MEM", bench._default_heap(SCALE_HEAP[args.scale])
    )
    from sparkfulltextquery_spark import get_spark

    spark = get_spark(app_name=f"sftq-isolated-{args.query}")
    import __spark_entry__ as E

    q = E.queries()[args.query]
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    walls = []
    for _ in range(3):
        t0 = time.time()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    walls.sort()
    median = round(walls[1], 3)

    out_path = REPO / "BENCH_ISOLATED.json"
    data = json.loads(out_path.read_text()) if out_path.exists() else {}
    data.setdefault(args.query, {})[args.scale] = median
    out_path.write_text(json.dumps(data, indent=1, sort_keys=True) + "\n")
    print(
        f"{args.query} @ sf{args.scale}: median {median}s "
        f"(runs: {[round(w, 3) for w in walls]}) -> BENCH_ISOLATED.json",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
