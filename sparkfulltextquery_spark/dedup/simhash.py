"""SimHash fingerprinting + banded hamming blocking.

28-bit SimHash over 3-token shingles: each shingle votes its tf on every
bit of its portable h28 hash (+tf if the bit is set, −tf otherwise); the fingerprint takes the sign
per bit. Near-dups = pairs within hamming distance d. Blocking: split the
28 bits into 4 bands of 7; by pigeonhole, any pair with hamming ≤ 3 shares
at least one identical band → candidate join on (band_idx, band_bits).

All stages are explode → groupBy → equi-join; the 28× bit expansion is
bounded and shuffles partial sums only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfulltextquery_spark.functions.hashes import h28

N_BITS = 28
N_BANDS = 4
BITS_PER_BAND = N_BITS // N_BANDS


def simhash_fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — 28-bit SimHash as a bigint."""
    from sparkfulltextquery_spark.functions.text import ngrams, tokenize

    # two-phase projection (tokenize → column → ngrams) — see minhash.py
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("_toks")
    )
    tf = (
        toks.select("doc_id", F.explode(ngrams(F.col("_toks"), 3)).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("doc_id", "tf", h28(F.col("token")).alias("h"))
    )
    bits = tf.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_BITS - 1))).alias("j"),
        F.col("tf"),
        F.col("h"),
    ).select(
        "doc_id",
        "j",
        # F.shiftright/shiftleft only take int shift amounts — column shifts
        # go through the SQL expression form
        F.when(F.expr("(h >> j) & 1") == 1, F.col("tf"))
        .otherwise(-F.col("tf"))
        .alias("vote"),
    )
    return (
        bits.groupBy("doc_id", "j")
        .agg(F.sum("vote").alias("s"))
        .select(
            "doc_id",
            F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), j)"))
            .otherwise(F.lit(0).cast("bigint"))
            .alias("bitval"),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").alias("fp"))
    )


def simhash_near_dups(
    docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with hamming(fp_a, fp_b) ≤ max_hamming,
    found via band blocking (guaranteed complete for max_hamming < N_BANDS)."""
    fps = simhash_fingerprints(docs, id_col, text_col)
    bands = fps.select(
        "doc_id",
        "fp",
        F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band"),
    ).select(
        "doc_id",
        "fp",
        "band",
        F.expr(f"(fp >> (band * {BITS_PER_BAND})) & {(1 << BITS_PER_BAND) - 1}").alias(
            "band_bits"
        ),
    )
    a = bands.select("band", "band_bits", F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"))
    b = bands.select("band", "band_bits", F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"))
    return (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
