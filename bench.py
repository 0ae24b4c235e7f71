#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = sum of per-query wall seconds (each query fully materialized via a
count-collect action; results are not pulled to the driver).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

# Headline set: the relational spine + the search/dedup/similarity
# capabilities the engine exists for.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "agg_distinct_exact",
    "agg_cube",
    "window_ranking",
    "window_running_sum",
    "join_using_natural",
    "topk_orders",
    "fulltext_postings_topdf",
    "fulltext_bm25_search",
    "fulltext_query_language",
    "fulltext_phrase_search",
    "dedup_exact_groups",
    "dedup_minhash_pairs",
    "sim_cosine_topk",
    "textstats_quality",
]


def main() -> None:
    from sparkfulltextquery_spark import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(CPUS))
    spark = get_spark(app_name="sftq-bench")

    import __spark_entry__ as E

    qs = E.queries()
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None

    # untimed warmup: JVM/codegen/committer init so per-query numbers are
    # steady-state, not first-job overhead
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        # one untimed warm run per query (whole-stage-codegen compilation),
        # then the timed run — the reference's Benchmark harness methodology
        # (warmup iterations before measurement)
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        # materialize fully without driver-collecting the payload
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
