"""Word2Vec training + findSynonyms (reference mllib/.../ml/feature/
Word2Vec.scala:121 fit, :205 findSynonyms).

The training side is delegated to ``pyspark.ml.feature.Word2Vec`` (skip-gram
with hierarchical softmax — distributed: partitions train locally, weights
average per iteration). The model's vectors land as a plain
(word, vector array<float>) DataFrame — same shape as the embeddings table,
so the consumption side (cosine top-k, IVF, LSH in this package) applies
unchanged. findSynonyms is re-expressed as the engine's own cosine top-k
over that table rather than the model's driver-side brute force — at scale
the vocabulary table is just another DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfulltextquery_spark.similarity import cosine_expr


def train_word2vec(
    docs: DataFrame,
    text_col: str = "text",
    vector_size: int = 32,
    min_count: int = 2,
    max_iter: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Train Word2Vec on tokenized ``text_col``; returns the vocabulary as
    (word, vector array<float>). Tokenization is the engine's shared spec
    (functions.text.tokenize) so vocab matches the posting tables."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    from sparkfulltextquery_spark.functions.text import tokenize

    toks = docs.select(tokenize(F.col(text_col)).alias("toks"))
    model = (
        Word2Vec(
            vectorSize=vector_size,
            minCount=min_count,
            maxIter=max_iter,
            seed=seed,
            inputCol="toks",
            outputCol="vec",
        )
        .fit(toks)
    )
    return model.getVectors().select(
        "word", vector_to_array(F.col("vector")).cast("array<float>").alias("vector")
    )


def find_synonyms(vectors: DataFrame, word: str, k: int = 5) -> DataFrame:
    """Top-k nearest words by cosine (reference Word2Vec.scala:205), as a
    join against the (word, vector) table: the query word's vector is a
    1-row broadcast side, scoring stays in whole-stage codegen, top-k plans
    as TakeOrderedAndProject. Returns (word, similarity)."""
    q = (
        vectors.filter(F.col("word") == word)
        .select(F.col("vector").cast("array<double>").alias("qvec"))
    )
    return (
        vectors.filter(F.col("word") != word)
        .crossJoin(F.broadcast(q))
        .select(
            "word",
            F.round(
                cosine_expr(F.col("vector").cast("array<double>"), F.col("qvec")), 4
            ).alias("similarity"),
        )
        .orderBy(F.col("similarity").desc(), F.col("word"))
        .limit(k)
    )
