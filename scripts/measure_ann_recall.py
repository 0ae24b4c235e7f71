"""ANN recall-vs-cost evidence at sf1 (VERDICT r08 #7).

LSH carries a recall-floor property test; IVF and IVF-PQ had equivalence
tests but no committed recall curve. This script measures mean recall@10
against brute-force cosine for two corpora:

1. the sf1 embeddings table AS GENERATED (20,000 vectors, dim 64, the
   `label` column as the coarse index) — which measurement shows is
   ISOTROPIC: labels carry no cosine-neighborhood information (same-label
   mean cosine 0.0), so the curve documents what coarse quantization does
   on structure-free data (recall ≈ scanned fraction);
2. a PLANTED clustered corpus at the same scale (20,000 vectors, 10
   Gaussian clusters on the sphere, sigma 0.2 — the regime ANN indexes
   exist for), where the recall/cost trade is real.

IVF at n_probe ∈ {1,2,4,8}; IVF-PQ (m=8, exact re-rank) at
(n_probe, shortlist_k) ∈ {(2,30), (2,200), (4,200)} — shortlist_k is the
dial that matters with a label-centroid codebook (see ivfpq_topk).
r10: also IVF-PQ with the TRAINED 256-code per-subspace codebook
(pq_train codes=256) at (2,30), (2,50), (2,100) — the directive's fix
for the shortlist_k ≈ cluster-size requirement.

Usage: python scripts/measure_ann_recall.py [sf_dir] [n_queries]
Paste the JSON lines / table into SCALE.md.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def planted_rows(n=20000, dim=64, k=10, sigma=0.2, seed=11):
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, size=n)
    v = centers[labels] + sigma * rng.normal(size=(n, dim))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return [(i, [float(x) for x in v[i]], int(labels[i])) for i in range(n)]


def measure(spark, emb, corpus_name, n_queries):
    from pyspark.sql import functions as F

    from sparkfulltextquery_spark.similarity import (
        cosine_topk,
        ivf_topk,
        ivfpq_topk,
        pq_encode,
        pq_train,
    )

    emb = emb.cache()
    n_vecs = emb.count()
    n_labels = emb.select("label").distinct().count()
    # honest labeling (r11, VERDICT r10 #7): echo the measured corpus's
    # actual size into every row — the name alone once claimed "sf1"
    # for whatever directory was measured
    corpus_name = f"{corpus_name} [{n_vecs} vectors, {n_labels} labels]"
    stride = max(n_vecs // n_queries, 1)
    qrows = (
        emb.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(n_queries)
        .collect()
    )
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows]

    lit = pq_train(emb, 8)
    codes = pq_encode(emb, literals=lit).cache()
    codes.count()

    truth = {
        qid: {r.vec_id for r in cosine_topk(emb, v, k=10).collect()}
        for qid, v in queries
    }

    def report(method, n_probe, extra, got_fn):
        rs = []
        for qid, v in queries:
            got = got_fn(v)
            rs.append(len(got & truth[qid]) / 10.0)
        row = {
            "corpus": corpus_name,
            "method": method,
            "n_probe": n_probe,
            **extra,
            "recall_at_10": round(sum(rs) / len(rs), 3),
            "scan_fraction": round(n_probe / n_labels, 2),
        }
        print(json.dumps(row), flush=True)

    for n_probe in (1, 2, 4, 8):
        report(
            "ivf", n_probe, {},
            lambda v, p=n_probe: {
                r.vec_id for r in ivf_topk(emb, v, k=10, n_probe=p).collect()
            },
        )
    for n_probe, sk in ((2, 30), (2, 200), (4, 200)):
        report(
            "ivfpq(m=8, exact re-rank)", n_probe, {"shortlist_k": sk},
            lambda v, p=n_probe, s=sk: {
                r.vec_id
                for r in ivfpq_topk(
                    emb, v, k=10, n_probe=p, shortlist_k=s,
                    literals=lit, codes=codes,
                ).collect()
            },
        )

    # trained 256-code per-subspace codebook (r10, VERDICT r09 #1); m=8
    # (8-dim subspaces) and m=16 (4-dim subspaces — finer ADC resolution,
    # the dial that matters once the codebook is trained: at 20k vectors
    # m=8 plateaus ~0.8 recall@10 while m=16 reaches 0.9 at shortlist 50)
    for m_sub in (8, 16):
        lit_t = pq_train(emb, m_sub, codes=256, train_iters=4)
        codes_t = pq_encode(emb, m=m_sub, literals=lit_t).cache()
        codes_t.count()
        for n_probe, sk in ((2, 30), (2, 50), (2, 100)):
            report(
                f"ivfpq(m={m_sub}, trained-256 codebook)",
                n_probe,
                {"shortlist_k": sk},
                lambda v, p=n_probe, s=sk, mm=m_sub, lt=lit_t, ct=codes_t: {
                    r.vec_id
                    for r in ivfpq_topk(
                        emb, v, k=10, n_probe=p, shortlist_k=s, m=mm,
                        literals=lt, codes=ct,
                    ).collect()
                },
            )
        codes_t.unpersist()

    # r11 (VERDICT r10 #2): FULL-AUTO config — pq_train/pq_encode/
    # ivfpq_topk with no knobs; the dict carries the derived
    # (m, codes, shortlist_k). This row is the no-knobs contract the
    # adaptive defaults must hold (>= 0.9 on clustered corpora).
    lit_a = pq_train(emb)
    codes_a = pq_encode(emb, literals=lit_a).cache()
    codes_a.count()
    trained = len(lit_a["labels"]) > len(lit_a["ivf_labels"])
    report(
        (
            f"ivfpq(FULL-AUTO: m={lit_a['m']}, "
            f"codes={'trained-' + str(len(lit_a['labels'])) if trained else 'label-centroid'}, "
            f"shortlist={lit_a.get('shortlist_k')})"
        ),
        2,
        {"shortlist_k": lit_a.get("shortlist_k")},
        lambda v: {
            r.vec_id
            for r in ivfpq_topk(
                emb, v, k=10, literals=lit_a, codes=codes_a
            ).collect()
        },
    )
    codes_a.unpersist()
    emb.unpersist()
    codes.unpersist()


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

    from sparkfulltextquery_spark import get_spark

    spark = get_spark(app_name="ann-recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # r10: the generated fixture is now the planted-cluster corpus itself
    # (make_sf1.clustered_embeddings) — this first sweep measures recall
    # on the REGISTERED table, not a side corpus. The label echoes the
    # actual directory measured (r11, VERDICT r10 #7).
    measure(spark, emb, f"registered:{sf_dir}", n_queries)

    planted = spark.createDataFrame(
        planted_rows(), "vec_id long, embedding array<float>, label int"
    )
    measure(spark, planted, "planted-10-clusters (sigma=0.2)", n_queries)


if __name__ == "__main__":
    main()
