"""Persistent inverted index: bucketed posting table + corpus stats.

SURVEY.md §7 step 3: the posting table is persisted with bucketBy(term)
(reference DataFrameWriter.bucketBy, sql/core/.../DataFrameWriter.scala:170)
so a query's term lookup prunes to the buckets holding its terms — no
shuffle, no full scan. Document lengths and corpus stats are precomputed
once; searches join them broadcast.

At 100 TB: postings bucket count scales with corpus (e.g. 4096); stats and
df tables are small; a search touches |query_terms| buckets of the posting
table plus broadcast stats — independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.functions.fulltext import (
    BM25_B,
    BM25_K1,
    _py_tokenize,
    corpus_stats,
    doc_freq,
    doc_lengths,
    postings,
)


def build_index(
    docs: DataFrame,
    table_prefix: str = "sftq_index",
    num_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    path: str | None = None,
) -> dict[str, str]:
    """Materialize the inverted index: bucketed postings + df + doc lengths +
    corpus stats. Returns the table names. `path` makes the tables external
    at an explicit location (warehouse.dir is a static conf and cannot be
    changed per-session)."""
    spark = docs.sparkSession
    names = {
        "postings": f"{table_prefix}_postings",
        "doc_freq": f"{table_prefix}_df",
        "doc_len": f"{table_prefix}_dl",
        "stats": f"{table_prefix}_stats",
    }

    def writer(df: DataFrame, name: str):
        w = df.write.mode("overwrite")
        if path:
            w = w.option("path", f"{path}/{name}")
        return w

    post = postings(docs, id_col, text_col)
    (
        writer(post.repartition(num_buckets, "term"), names["postings"])
        .bucketBy(num_buckets, "term")
        .sortBy("term")
        .saveAsTable(names["postings"])
    )
    # df is computed from the bucketed table — bucket-local aggregation
    writer(
        spark.table(names["postings"]).groupBy("term").agg(F.count(F.lit(1)).alias("df")),
        names["doc_freq"],
    ).saveAsTable(names["doc_freq"])
    writer(doc_lengths(docs, id_col, text_col), names["doc_len"]).saveAsTable(
        names["doc_len"]
    )
    writer(corpus_stats(docs, id_col, text_col), names["stats"]).saveAsTable(
        names["stats"]
    )
    return names


def bm25_search_indexed(
    spark: SparkSession,
    query: str,
    k: int = 10,
    table_prefix: str = "sftq_index",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k over the persisted index. The postings scan is pruned to
    the query terms' buckets (plan shows SelectedBucketsCount); everything
    else joins broadcast. Scoring formula identical to fulltext.bm25_search."""
    q_terms = sorted(set(_py_tokenize(query)))
    if not q_terms:
        raise ValueError("empty query after tokenization")
    post = spark.table(f"{table_prefix}_postings").filter(F.col("term").isin(q_terms))
    dfreq = spark.table(f"{table_prefix}_df").filter(F.col("term").isin(q_terms))
    dl = spark.table(f"{table_prefix}_dl")
    stats = spark.table(f"{table_prefix}_stats")
    scored = (
        post.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "tscore",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("tscore"), 4).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
