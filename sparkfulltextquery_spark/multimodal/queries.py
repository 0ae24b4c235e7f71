"""Registered multimodal queries + DuckDB oracles.

The fake decoder is pure byte arithmetic, so even the mapInPandas feature
path has an exact SQL oracle — proving the Arrow plumbing end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.multimodal import as_media_table, extract_features
from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table


@query(
    "multimodal_blob_stats",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text)                  AS content_md5,
           'text/plain'               AS mime
    FROM documents WHERE doc_id < 200
    """,
)
def multimodal_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload plumbing: byte length + content hash over BinaryType,
    metadata struct fields projected out."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = as_media_table(d)
    return media.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5(F.decode(F.col("payload"), "utf-8")).alias("content_md5"),
        F.col("meta.mime").alias("mime"),
    )


@query(
    "multimodal_fake_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           array_to_string([octet_length(encode(text))::BIGINT,
            ascii(substr(text, 1, 1)),
            ascii(substr(text, length(text), 1)),
            cast(list_sum(list_transform(range(1, length(text) + 1),
                          i -> ascii(substr(text, i, 1)))) AS bigint) % 997
           ], ',') AS feat_str
    FROM documents WHERE doc_id < 100
    """,
)
def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction with the deterministic fake decoder —
    the full Arrow round-trip (binary + struct in, array<double> out),
    oracle-checked byte-for-byte. NOTE: the oracle's byte arithmetic assumes
    ASCII text (true for the synthetic corpus); the Spark side operates on
    raw bytes and is encoding-correct in general."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    feats = extract_features(as_media_table(d), mode="fake")
    # feature values are integral by construction — project the array to a
    # joined string so the comparison layer is immune to numpy-vs-list
    # rendering; the mapInPandas stage still produces the real array column
    return feats.select(
        "doc_id",
        "n_bytes",
        F.concat_ws(
            ",", F.transform("feat", lambda x: x.cast("bigint").cast("string"))
        ).alias("feat_str"),
    )


@query(
    "multimodal_size_rollup",
    oracle="""
    SELECT meta_source AS source,
           count(*) AS n_assets,
           cast(sum(octet_length(encode(text))) AS bigint) AS total_bytes,
           max(octet_length(encode(text)))      AS max_bytes
    FROM (SELECT source AS meta_source, text FROM documents)
    GROUP BY meta_source
    """,
)
def multimodal_size_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset-size accounting by source — the storage-budget query; groups on
    a metadata struct field."""
    d = load_table(spark, sf_dir, "documents")
    media = as_media_table(d)
    return media.groupBy(F.col("meta.source").alias("source")).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.max(F.col("meta.n_bytes")).alias("max_bytes"),
    )
