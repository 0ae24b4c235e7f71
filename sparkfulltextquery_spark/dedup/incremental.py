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
    doc_shingle_profiles,
    lsh_band_keys,
    signature_cols_from_hs,
)


def _profile_bands(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
    """(profiles, bands): the map-side shingle profile relation and its LSH
    band keys — signatures as per-row array expressions, no shuffle
    (values identical to the relation/groupBy form; see minhash.py)."""
    prof = doc_shingle_profiles(docs, id_col, text_col)
    bands = lsh_band_keys(prof.select("doc_id", *signature_cols_from_hs()))
    return prof, bands


def build_signature_store(docs: DataFrame, path: str) -> None:
    """Persist the corpus's LSH band keys (partitioned by band — probe joins
    prune to the band directory) and shingle-set sizes. segment = -1 marks
    the batch-built generation; streamed appends stamp their batch id."""
    prof, bands = _profile_bands(docs)
    bands.withColumn("segment", F.lit(-1)).write.mode("overwrite").partitionBy(
        "band"
    ).parquet(f"{path}/bands")
    sizes = prof.select("doc_id", "n").withColumn("segment", F.lit(-1))
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
        prof, bands = _profile_bands(batch_df, id_col, text_col)
        (
            bands.withColumn("segment", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("band")
            .parquet(f"{store_path}/bands")
        )
        (
            prof.select("doc_id", "n")
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
    delta_prof, delta_bands = _profile_bands(new_docs, id_col, text_col)

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
    old_prof = doc_shingle_profiles(old_cand_docs, id_col, text_col)

    old_sizes = spark.read.parquet(f"{store_path}/sizes").select(
        F.col("doc_id").alias("doc_old"), F.col("n").alias("n_old")
    )

    # exact Jaccard as one array_intersect per candidate pair (see
    # minhash.verified_near_dups) — shingle STRING arrays, byte-identical
    # to the token-relation form
    inter = F.size(F.array_intersect(F.col("sh_new"), F.col("sh_old")))
    return (
        cands.join(
            delta_prof.select(
                F.col("doc_id").alias("doc_new"),
                F.col("sh").alias("sh_new"),
                F.col("n").alias("n_new"),
            ),
            "doc_new",
        )
        .join(
            old_prof.select(
                F.col("doc_id").alias("doc_old"), F.col("sh").alias("sh_old")
            ),
            "doc_old",
        )
        .join(old_sizes, "doc_old")
        .select(
            "doc_new",
            "doc_old",
            F.round(inter / (F.col("n_new") + F.col("n_old") - inter), 6).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
