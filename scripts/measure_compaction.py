#!/usr/bin/env python
"""Measure sample-trained vs full-corpus reclustered ANN compaction
(r12, VERDICT r11 #2).

`compact_ann_index(recluster_k=...)` re-carves the coarse structure with
Lloyd k-means. The r11 implementation ran every round over the FULL live
corpus — kmeans_iters x full scans, the compaction bill at 100 TB. r12
trains on a bounded deterministic sample (~1000*k rows, content-addressed
by xxhash64(vec_id, seed)) and pays ONE full-corpus assign. This script
measures both on the SAME drift fixture shape as the lifecycle tests
(base clusters 0-9, appends drawn from unseen clusters 10-14) and prints
wall + recall@10 (n_probe=2, against brute-force cosine truth) per mode.

Usage:
    python scripts/measure_compaction.py [n_total] [dim]
Prints one JSON line per mode; paste the table into SCALE.md.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k = 15

    import numpy as np
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from sparkfulltextquery_spark.similarity import (
        ann_search_indexed,
        cosine_topk,
    )
    from sparkfulltextquery_spark.similarity.lifecycle import (
        compact_ann_index,
        init_ann_index,
    )

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def draw(seed, n, start, lo, hi):
        r = np.random.default_rng(seed)
        lab = r.integers(lo, hi, size=n)
        v = centers[lab] + 0.2 * r.normal(size=(n, dim))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return [
            (start + i, [float(x) for x in v[i]], int(lab[i]))
            for i in range(n)
        ]

    n_base = n_total // 5
    base = draw(11, n_base, 0, 0, 10)
    appends = draw(12, n_total - n_base, n_base, 10, 15)  # drift
    schema = "vec_id long, embedding array<float>, label int"

    tmp = tempfile.mkdtemp()
    full_df = spark.createDataFrame(base + appends, schema).cache()
    qs = [(vid, v) for vid, v, _l in appends if vid % 4099 == 0][:8]
    truth = {
        qid: {r.vec_id for r in cosine_topk(full_df, v, k=10).collect()}
        for qid, v in qs
    }

    for mode, sample in (("full-corpus", 0), ("sample-trained", None)):
        root = f"{tmp}/root_{mode}"
        init_ann_index(spark, full_df, root)
        t0 = time.perf_counter()
        gen = compact_ann_index(
            spark, root, publish=True, recluster_k=k,
            train_sample_size=sample,
        )
        wall = time.perf_counter() - t0
        rs = [
            len(
                {
                    r.vec_id
                    for r in ann_search_indexed(
                        spark, gen, v, k=10, n_probe=2
                    ).collect()
                }
                & truth[qid]
            )
            / 10.0
            for qid, v in qs
        ]
        print(
            json.dumps(
                {
                    "mode": f"recluster compaction, {mode}",
                    "n_vectors": n_total,
                    "dim": dim,
                    "k": k,
                    "train_rows": (
                        n_total if sample == 0 else 1000 * k
                    ),
                    "compact_s": round(wall, 2),
                    "recall_at_10": round(sum(rs) / len(rs), 3),
                }
            ),
            flush=True,
        )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
