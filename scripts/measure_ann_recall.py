"""ANN recall-vs-cost evidence at sf1 (VERDICT r08 #7).

LSH carries a recall-floor property test; IVF and IVF-PQ had equivalence
tests but no committed recall curve. This script measures mean recall@10
against brute-force cosine over the sf1 embeddings corpus (20,000
vectors, dim 64, 10 coarse clusters) for IVF at n_probe ∈ {1,2,4,8} and
IVF-PQ (m=8 subspaces, exact re-rank) at n_probe ∈ {2,4}, plus the
fraction of the corpus each probe setting scans. Paste the table into
SCALE.md.

Usage: python scripts/measure_ann_recall.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    if not Path(f"{sf_dir}/embeddings.parquet").exists():
        import subprocess

        print(f"building {sf_dir} via make_sf1.py ...", file=sys.stderr)
        subprocess.run(
            [sys.executable, str(Path(__file__).parent / "make_sf1.py")],
            check=True,
            stdout=sys.stderr,
        )

    from pyspark.sql import functions as F

    from sparkfulltextquery_spark import get_spark
    from sparkfulltextquery_spark.similarity import (
        cosine_topk,
        ivf_topk,
        ivfpq_topk,
        pq_encode,
        pq_train,
    )

    spark = get_spark(app_name="ann-recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_vecs = emb.count()
    n_labels = emb.select("label").distinct().count()

    # deterministic query sample: evenly-strided vec_ids, vectors collected
    # once (the bounded driver transfer a real query workload would carry)
    stride = max(n_vecs // n_queries, 1)
    qrows = (
        emb.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(n_queries)
        .collect()
    )
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows]

    # PQ artifacts trained ONCE (the persisted-index shape): codebook
    # literals + code table
    lit = pq_train(emb, 8)
    codes = pq_encode(emb, literals=lit).cache()
    codes.count()

    truth = {
        qid: {r.vec_id for r in cosine_topk(emb, v, k=10).collect()}
        for qid, v in queries
    }

    def recall(got_ids: set, qid) -> float:
        return len(got_ids & truth[qid]) / 10.0

    results = []
    for n_probe in (1, 2, 4, 8):
        rs = []
        for qid, v in queries:
            got = {r.vec_id for r in ivf_topk(emb, v, k=10, n_probe=n_probe).collect()}
            rs.append(recall(got, qid))
        results.append(
            {
                "method": "ivf",
                "n_probe": n_probe,
                "recall_at_10": round(sum(rs) / len(rs), 4),
                "min_recall": round(min(rs), 2),
                "scan_fraction": round(n_probe / n_labels, 2),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    for n_probe in (2, 4):
        rs = []
        for qid, v in queries:
            got = {
                r.vec_id
                for r in ivfpq_topk(
                    emb, v, k=10, n_probe=n_probe, literals=lit, codes=codes
                ).collect()
            }
            rs.append(recall(got, qid))
        results.append(
            {
                "method": "ivfpq(m=8, exact re-rank)",
                "n_probe": n_probe,
                "recall_at_10": round(sum(rs) / len(rs), 4),
                "min_recall": round(min(rs), 2),
                "scan_fraction": round(n_probe / n_labels, 2),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    print(
        json.dumps(
            {"corpus": n_vecs, "n_labels": n_labels, "n_queries": len(queries)}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
