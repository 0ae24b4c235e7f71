"""Incremental MinHash dedup: new document batches probed against a
persisted signature store — the corpus is never re-hashed.

At 100 TB the corpus's shingle sets and MinHash band keys are computed
exactly once and persisted (the "store"); each ingest batch then:

1. shingles + signs ONLY the delta (the expensive scan is proportional to
   the batch, not the corpus),
2. probes the store's band buckets with the delta's band keys — a
   partition-pruned equi-join on (band, band_key), never a corpus scan,
3. exact-Jaccard-verifies candidates only, re-reading just the candidate
   old documents through a semi join (predicate pushdown keeps the corpus
   read proportional to the candidate set).

The store layout is plain parquet partitioned by band, so at scale each
probe touches one band directory per delta band key; sizes are persisted
beside it so verification needs no corpus-wide aggregation.

Reference anchor: the reference's index update path (incremental posting
maintenance) — re-expressed as persisted-DataFrame state + delta joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.dedup.minhash import (
    doc_shingle_sets,
    lsh_band_keys,
    minhash_signatures_wide,
)


def build_signature_store(docs: DataFrame, path: str) -> None:
    """Persist the corpus's LSH band keys (partitioned by band — probe joins
    prune to the band directory) and shingle-set sizes. segment = -1 marks
    the batch-built generation; streamed appends stamp their batch id."""
    toks = doc_shingle_sets(docs)
    bands = lsh_band_keys(minhash_signatures_wide(toks)).withColumn(
        "segment", F.lit(-1)
    )
    bands.write.mode("overwrite").partitionBy("band").parquet(f"{path}/bands")
    sizes = (
        toks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("segment", F.lit(-1))
    )
    sizes.write.mode("overwrite").parquet(f"{path}/sizes")


def stream_update_signature_store(
    doc_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Keep the signature store fresh as documents stream in: each
    micro-batch signs only its own docs and appends band keys + sizes as
    log segments stamped with the batch id (the same log-structured
    discipline as functions.index.stream_update_postings — never rewrite,
    exactly-once from checkpointed offsets + idempotent batch-id appends).
    Later incremental_near_dups probes see streamed docs immediately."""

    def update(batch_df: DataFrame, batch_id: int) -> None:
        toks = doc_shingle_sets(batch_df, id_col, text_col)
        (
            lsh_band_keys(minhash_signatures_wide(toks))
            .withColumn("segment", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("band")
            .parquet(f"{store_path}/bands")
        )
        (
            toks.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("segment", F.lit(batch_id))
            .write.mode("append")
            .parquet(f"{store_path}/sizes")
        )

    return (
        doc_stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def incremental_near_dups(
    spark: SparkSession,
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    store_path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_new, doc_old, jaccard): new-batch docs whose exact Jaccard vs an
    existing corpus doc is ≥ threshold, found via the persisted store —
    no corpus re-hashing, candidate-only verification."""
    delta_toks = doc_shingle_sets(new_docs, id_col, text_col)
    delta_bands = lsh_band_keys(minhash_signatures_wide(delta_toks))

    old_bands = spark.read.parquet(f"{store_path}/bands")
    cands = (
        delta_bands.select(
            "band", "band_key", F.col("doc_id").alias("doc_new")
        )
        .join(
            old_bands.select("band", "band_key", F.col("doc_id").alias("doc_old")),
            ["band", "band_key"],
        )
        .select("doc_new", "doc_old")
        .distinct()
    )

    # verification only touches candidate old docs: semi join pushes the
    # candidate id set into the corpus read
    old_cand_docs = corpus_docs.join(
        cands.select(F.col("doc_old").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    )
    old_toks = doc_shingle_sets(old_cand_docs, id_col, text_col)

    delta_sizes = delta_toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_new"))
    old_sizes = spark.read.parquet(f"{store_path}/sizes").select(
        F.col("doc_id").alias("doc_old"), F.col("n").alias("n_old")
    )

    inter = (
        cands.join(
            delta_toks.select(F.col("doc_id").alias("doc_new"), "token"), "doc_new"
        )
        .join(
            old_toks.select(F.col("doc_id").alias("doc_old"), "token"),
            ["doc_old", "token"],
        )
        .groupBy("doc_new", "doc_old")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            delta_sizes.select(F.col("doc_id").alias("doc_new"), "n_new"), "doc_new"
        )
        .join(old_sizes, "doc_old")
        .select(
            "doc_new",
            "doc_old",
            F.round(
                F.col("n_inter")
                / (F.col("n_new") + F.col("n_old") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
