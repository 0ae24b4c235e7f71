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


def replicate(src: str, dst: str, n_replicas: int, out_partitions: int = 32) -> None:
    """Replicate a testdata directory ``n_replicas``x with disjoint key
    offsets (shared by make_sf1 and make_sf10 — the sf10 build replicates
    sf0.1 100x, so offsets top out at 99*OFF ≈ 1e10, well inside long).

    Replicas are written in CHUNKS of ≤10 appended to the same directory:
    the r8 sf10 build OOM'd the default driver heap on a single 100-way
    union + one giant repartition shuffle; chunking bounds each shuffle
    to sf1 size and the append leaves identical data. Driver heap is
    raised explicitly (local mode = driver does everything)."""
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    os.makedirs(dst, exist_ok=True)
    for t in SMALL:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(t, df.count())
    chunk = 10
    n_chunks = (n_replicas + chunk - 1) // chunk
    parts_per_chunk = max(8, out_partitions // n_chunks)
    for t, keys in KEY_COLS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        for lo in range(0, n_replicas, chunk):
            reps = []
            for r in range(lo, min(lo + chunk, n_replicas)):
                rep = df
                for kcol in keys:
                    rep = rep.withColumn(
                        kcol,
                        (F.col(kcol) + F.lit(r * OFF)).cast(
                            df.schema[kcol].dataType
                        ),
                    )
                reps.append(rep)
            out = reps[0]
            for rep in reps[1:]:
                out = out.unionAll(rep)
            out.repartition(parts_per_chunk).write.mode(
                "overwrite" if lo == 0 else "append"
            ).parquet(f"{dst}/{t}.parquet")
        print(t, spark.read.parquet(f"{dst}/{t}.parquet").count())


def main() -> None:
    replicate(SRC, DST, R)


if __name__ == "__main__":
    main()
