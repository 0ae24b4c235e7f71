"""Registered similarity-search queries + DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table

EMB_DIM = 64  # synthetic corpus embedding dimension (checked in tests)

_E_CTE = """
    e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
"""

_COS = (
    "list_inner_product({a}, {b}) / "
    "(sqrt(list_sum(list_transform({a}, x -> x * x))) * "
    "sqrt(list_sum(list_transform({b}, x -> x * x))))"
)


@query(
    "sim_cosine_topk",
    oracle=f"""
    WITH {_E_CTE},
    scored AS (
      SELECT vec_id, round({_COS.format(a='v', b='qv')}, 6) AS cosine
      FROM e CROSS JOIN q
    )
    SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the vec_id=0 embedding — the exact
    ANN baseline. Query vector is a 1-row bounded collect (the only
    driver-side value in the pipeline), then a literal broadcast."""
    from sparkfulltextquery_spark.similarity import cosine_topk

    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return cosine_topk(e, [float(x) for x in qvec], k=10)


@query(
    "sim_ivf_topk",
    oracle=f"""
    WITH {_E_CTE},
    dims AS (
      SELECT label, unnest(range(1, len(v) + 1)) AS dim, unnest(v) AS x FROM e
    ),
    cents AS (
      SELECT label, list(m ORDER BY dim) AS c
      FROM (SELECT label, dim, avg(x) AS m FROM dims GROUP BY label, dim)
      GROUP BY label
    ),
    probes AS (
      SELECT label FROM cents CROSS JOIN q
      ORDER BY {_COS.format(a='c', b='qv')} DESC, label LIMIT 3
    )
    SELECT vec_id, round({_COS.format(a='v', b='qv')}, 6) AS cosine
    FROM e JOIN probes USING (label) CROSS JOIN q
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe the 3 clusters whose centroids are nearest the
    query, brute-force only those. At scale = partition pruning on the
    cluster column; centroids computed shuffle-parallel (posexplode+groupBy)."""
    from sparkfulltextquery_spark.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return ivf_topk(e, [float(x) for x in qvec], k=10, n_probe=3)


def _lsh_buckets_oracle() -> str:
    from sparkfulltextquery_spark.similarity import hyperplane_bucket_duck

    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT {hyperplane_bucket_duck('v', EMB_DIM)} AS bucket, count(*) AS n
    FROM e GROUP BY 1
    """


@query("sim_lsh_buckets", oracle=_lsh_buckets_oracle())
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing: 12-bit sign key per vector; returns
    bucket occupancy (bucket, n). The n²-free blocking primitive for
    embedding near-dup at scale."""
    from sparkfulltextquery_spark.similarity import hyperplane_bucket

    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(
            hyperplane_bucket(F.col("embedding").cast("array<double>"), EMB_DIM).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
