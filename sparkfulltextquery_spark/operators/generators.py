"""Generator / UDTF-like coverage (SURVEY.md §2.9).

Reference: GenerateExec (sql/core/.../execution/GenerateExec.scala:50) with
Explode/PosExplode (catalyst expressions/generators.scala:234/250), Inline
(:258), Stack (:107). Generators are per-row 1→N expansions — shuffle-free,
pipeline-friendly, and the backbone of the full-text posting-list build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table

# Shared tokenizer expression — MUST stay in lockstep with the DuckDB
# fragment below and functions/text.py::tokenize.
_TOKENIZE_DUCK = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"


def _tokens(col):
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != "")


@query(
    "explode_tokens",
    oracle=f"""
    SELECT doc_id, unnest({_TOKENIZE_DUCK}) AS token
    FROM documents WHERE doc_id < 100
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(array) → one row per token (reference Explode generators.scala:234)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))


@query(
    "posexplode_tokens",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKENIZE_DUCK} AS toks
               FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           unnest(range(len(toks))) AS pos,
           unnest(toks)             AS token
    FROM t
    """,
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode → (pos, value) rows; positions are 0-based in both engines
    (DuckDB side zips two parallel unnests since WITH ORDINALITY is absent)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "token")
    )


@query(
    "explode_outer_empty",
    oracle="""
    WITH t AS (SELECT doc_id,
                      CASE WHEN doc_id % 3 = 0 THEN []
                           ELSE [source, lang] END AS attrs
               FROM documents WHERE doc_id < 30)
    SELECT doc_id, unnest(CASE WHEN len(attrs) = 0 THEN [NULL] ELSE attrs END) AS attr
    FROM t
    """,
)
def explode_outer_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer keeps rows whose array is empty (null-extended) —
    the `outer` flag on GenerateExec (reference GenerateExec.scala:50)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    attrs = F.when(F.col("doc_id") % 3 == 0, F.array().cast("array<string>")).otherwise(
        F.array(F.col("source"), F.col("lang"))
    )
    return d.select("doc_id", F.explode_outer(attrs).alias("attr"))


@query(
    "inline_structs",
    oracle="""
    SELECT n_nationkey, 'name' AS k, n_name AS v FROM nation
    UNION ALL
    SELECT n_nationkey, 'region' AS k, cast(n_regionkey AS varchar) AS v FROM nation
    """,
)
def inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline(array<struct>) → columns per struct field (reference Inline
    generators.scala:258); also the unpivot/melt idiom."""
    n = load_table(spark, sf_dir, "nation")
    arr = F.array(
        F.struct(F.lit("name").alias("k"), F.col("n_name").alias("v")),
        F.struct(F.lit("region").alias("k"), F.col("n_regionkey").cast("string").alias("v")),
    )
    return n.select("n_nationkey", F.inline(arr).alias("k", "v"))


@query(
    "stack_unpivot",
    oracle="""
    SELECT p_partkey, 'brand' AS attr, p_brand AS val FROM part
    UNION ALL
    SELECT p_partkey, 'type' AS attr, p_type AS val FROM part
    """,
)
def stack_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stack(n, k1, v1, ...) — SQL UDTF-style unpivot (reference Stack
    generators.scala:107)."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, s.attr, s.val
        FROM part
        LATERAL VIEW stack(2, 'brand', p_brand, 'type', p_type) s AS attr, val
        """
    )


@query(
    "sentences_split",
    oracle="""
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(text, '[.!?]+\\s*'), s -> s <> ''))
             AS n_sentences
    FROM documents WHERE doc_id < 200
    """,
)
def sentences_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation — the reference's `sentences` expression
    (stringExpressions.scala:1393, BreakIterator-based) re-expressed as a
    deterministic regex split so the oracle can agree. F.sentences itself is
    exercised (non-oracle) in fulltext_sentences_builtin."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sents = F.filter(
        F.split(F.col("text"), r"[.!?]+\s*"), lambda s: s != ""
    )
    return d.select("doc_id", F.size(sents).alias("n_sentences"))


@query(
    "sentences_builtin",
    oracle="""
    SELECT doc_id,
           CAST(1 AS BIGINT) AS n_sentences,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           text AS sentences_text
    FROM documents WHERE doc_id < 100
    """,
)
def sentences_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's locale-aware `sentences` SQL function itself
    (stringExpressions.scala:1393) — returns array<array<string>> of
    sentence→words. BreakIterator locale semantics are JVM-specific in
    general, but on this corpus they are fully determined: every document
    is non-empty, single-space-separated, lowercase alphanumeric words with
    no sentence terminators (verified at sf0.001/0.01/0.1), so en_US
    BreakIterator yields exactly one sentence whose words are the
    whitespace tokens and whose space-joined reconstruction is the original
    text — all three statable in ANSI SQL for the oracle."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    sw = F.sentences(F.col("text"), F.lit("en"), F.lit("US"))
    # project flat scalars/strings (not array<array<string>>): the driver's
    # canonicalizer sorts columns through pandas, which cannot hash list cells
    return d.select(
        "doc_id",
        F.size(sw).cast("long").alias("n_sentences"),
        F.aggregate(sw, F.lit(0), lambda acc, s: acc + F.size(s))
        .cast("long")
        .alias("n_words"),
        F.array_join(
            F.transform(sw, lambda s: F.array_join(s, " ")), " | "
        ).alias("sentences_text"),
    )
