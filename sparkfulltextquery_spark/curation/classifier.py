"""Model-based quality scoring: a hashed-feature linear classifier
(fasttext-style quality filter) as pure column expressions.

The production shape for corpus filtering at 100 TB: a small linear model
(weights fit offline) scored inside the scan — no Python, no UDF, no
model-server round trip. Features are the hashing trick over tokens
(HashingTF, reference mllib HashingTF.scala:40): bucket = h(token) mod B,
x_b = ln(1 + count_b), score = sigmoid(w·x + bias).

Weights here are deterministic placeholder literals (a fixed LCG over the
bucket index, 3-decimal values) standing in for offline-trained
coefficients — the *plan shape* is the deliverable: tokenize → explode →
bucket-count (one key-partitioned shuffle) → weight lookup from a literal
array (broadcast-free: the model ships inside the plan) → per-doc sum →
sigmoid. Every step is whole-stage-codegen'd; swapping in real weights is
a one-line change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkfulltextquery_spark.functions.hashes import h28, h28_duck
from sparkfulltextquery_spark.functions.text import tokenize, tokenize_duck

N_BUCKETS = 64
BIAS = -0.25

# Placeholder coefficients: w_j = ((j*2654435761) mod 2000)/1000 - 1, rounded
# to 3 decimals — exact-decimal literals both engines parse identically.
WEIGHTS: tuple[float, ...] = tuple(
    round(((j * 2654435761) % 2000) / 1000.0 - 1.0, 3) for j in range(N_BUCKETS)
)


def quality_logit_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, quality_score, keep): sigmoid(w·ln(1+hashed-counts) + bias).

    Two key-partitioned shuffles — (doc, bucket) counts, then per-doc sum;
    the weight vector is a plan literal indexed by element_at, so the model
    is broadcast implicitly with the tasks."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("token"),
    )
    feats = (
        toks.select("doc_id", F.pmod(h28(F.col("token")), F.lit(N_BUCKETS)).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_arr = F.array(*[F.lit(w) for w in WEIGHTS])
    contrib = (
        F.element_at(w_arr, (F.col("bucket") + 1).cast("int"))
        * F.log(F.lit(1.0) + F.col("c"))
    )
    z = F.lit(BIAS) + F.sum(contrib)
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        feats.groupBy("doc_id")
        .agg(F.round(score, 6).alias("quality_score"))
        .withColumn("keep", F.col("quality_score") >= 0.5)
    )


def quality_logit_oracle(table: str = "documents") -> str:
    """DuckDB twin of quality_logit_score — identical constants by
    construction."""
    w_values = ", ".join(f"({j}, {w})" for j, w in enumerate(WEIGHTS))
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({tokenize_duck('text')}) AS token FROM {table}
    ),
    feats AS (
      SELECT doc_id, {h28_duck('token')} % {N_BUCKETS} AS bucket, count(*) AS c
      FROM toks GROUP BY doc_id, bucket
    ),
    w(bucket, w) AS (VALUES {w_values}),
    z AS (
      SELECT doc_id, {BIAS} + sum(w * ln(1 + c)) AS z
      FROM feats JOIN w USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-z)), 6) AS quality_score,
           round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS keep
    FROM z
    """
