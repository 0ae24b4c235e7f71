#!/usr/bin/env python
"""Generate the sf1 scaling-curve dataset (~6M lineitem) used by SCALE.md.

Replicates /root/testdata/sf0.1 10x with disjoint key offsets, so every
replica joins only within itself and join selectivities match the source
exactly. Deterministic. Writes to /tmp/sf1 (a benchmark artifact — the
driver's read-only testdata is never touched).

Run:  python scripts/make_sf1.py
Then: SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_SKIP_MICRO=1 python bench.py
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
R = 10
OFF = 100_000_000  # per-replica key offset, far above any sf0.1 key

KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SMALL = ["region", "nation"]  # O(25) dims: copied, not replicated


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    os.makedirs(DST, exist_ok=True)
    for t in SMALL:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(t, df.count())
    for t, keys in KEY_COLS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        reps = []
        for r in range(R):
            rep = df
            for kcol in keys:
                rep = rep.withColumn(
                    kcol,
                    (F.col(kcol) + F.lit(r * OFF)).cast(df.schema[kcol].dataType),
                )
            reps.append(rep)
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionAll(rep)
        out.repartition(32).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(t, spark.read.parquet(f"{DST}/{t}.parquet").count())


if __name__ == "__main__":
    main()
