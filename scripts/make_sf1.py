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
}
SMALL = ["region", "nation"]  # O(25) dims: copied, not replicated

# embeddings are GENERATED, not replicated (r10, VERDICT r09 #2): the
# sf0.1 fixture embeddings are isotropic — measured same-label mean
# pairwise cosine 0.0000, so its `label` column carries zero neighborhood
# information and every ANN/semdedup row at the generated scales measured
# wall time but not retrieval quality. The scaled fixtures instead plant
# label-correlated Gaussian clusters on the unit sphere (the recall
# harness's construction: k=10 centers, sigma=0.2 → within-cluster mean
# cosine ≈ 0.28, cross-cluster ≈ 0), keeping the replication contract —
# same schema, same per-replica row count, replica r's ids = base ids +
# r·OFF — while giving each replica FRESH per-replica noise (non-clone:
# no vector repeats across replicas). Cluster centers are shared across
# replicas and scales (one seed), so sf10 is a denser sampling of the
# same geometry, not a different corpus.
EMB = {"dim": 64, "k": 10, "sigma": 0.2, "seed": 2026}


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

    clustered_embeddings(spark, src, dst, n_replicas)
    print("embeddings", spark.read.parquet(f"{dst}/embeddings.parquet").count())


def clustered_embeddings(spark, src: str, dst: str, n_replicas: int) -> None:
    """Write the planted-cluster embeddings table (see EMB note above).
    Base count/ids come from the source table so the id-offset contract
    matches the replicated tables exactly."""
    import numpy as np
    import pandas as pd

    base_ids = [
        r[0]
        for r in spark.read.parquet(f"{src}/embeddings.parquet")
        .select("vec_id")
        .orderBy("vec_id")
        .collect()
    ]
    dim, k, sigma = EMB["dim"], EMB["k"], EMB["sigma"]
    rng_c = np.random.default_rng(EMB["seed"])
    centers = rng_c.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    base_n = len(base_ids)
    ids = np.asarray(base_ids, dtype=np.int64)
    pdfs = []
    for r in range(n_replicas):
        rng = np.random.default_rng(EMB["seed"] + 1 + r)
        labels = rng.integers(0, k, size=base_n)
        v = centers[labels] + sigma * rng.normal(size=(base_n, dim))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        # float32 round-trip BEFORE tolist so the stored floats are the
        # exact parquet FLOAT values (python floats otherwise re-round)
        v = v.astype(np.float32)
        pdfs.append(
            pd.DataFrame(
                {
                    "vec_id": ids + r * OFF,
                    "embedding": v.tolist(),
                    "label": labels.astype(np.int32),
                }
            )
        )
    pdf = pd.concat(pdfs, ignore_index=True)
    df = spark.createDataFrame(
        pdf, schema="vec_id long, embedding array<float>, label int"
    )
    df.repartition(max(4, n_replicas // 4)).write.mode("overwrite").parquet(
        f"{dst}/embeddings.parquet"
    )


def main() -> None:
    replicate(SRC, DST, R)


if __name__ == "__main__":
    main()
