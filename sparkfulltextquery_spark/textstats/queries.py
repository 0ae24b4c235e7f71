"""Registered text-analysis queries + DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.functions.text import (
    STOPWORDS,
    ngrams,
    ngrams_duck,
    tokenize,
    tokenize_duck,
)
from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table
from sparkfulltextquery_spark.textstats import (
    LANG_MARKERS,
    avg_token_len,
    char_count,
    fingerprint,
    fingerprint_duck,
    lang_guess,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)

_TOK = tokenize_duck("text")
_SW = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


@query(
    "textstats_counts",
    oracle=f"""
    SELECT doc_id,
           len({_TOK})     AS n_tokens,
           length(text)    AS n_chars,
           round(CASE WHEN len({_TOK}) = 0 THEN 0.0
                 ELSE list_sum(list_transform({_TOK}, t -> length(t)::DOUBLE))
                      / len({_TOK}) END, 6) AS avg_tok_len
    FROM documents WHERE doc_id < 200
    """,
)
def textstats_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char counting — whitespace+punct tokenizer (the BPE-ish regex
    variant lives in the tokenizer spec itself)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        char_count(F.col("text")).alias("n_chars"),
        F.round(avg_token_len(F.col("text")), 6).alias("avg_tok_len"),
    )


@query(
    "textstats_quality",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             len({_TOK})::DOUBLE AS n,
             CASE WHEN len({_TOK}) = 0 THEN 0.0
                  ELSE len(list_filter({_TOK}, t -> list_contains({_SW}, t)))::DOUBLE
                       / len({_TOK}) END AS swr,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE
                       / length(text) END AS pr
      FROM documents
    )
    SELECT doc_id,
           round(swr, 6) AS stopword_ratio,
           round(pr, 6)  AS punct_ratio,
           round(0.4 * least(n / 50.0, 1.0)
               + 0.3 * least(swr / 0.4, 1.0)
               + 0.3 * (1 - pr), 6) AS quality
    FROM s
    """,
)
def textstats_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/stopword/punctuation composite in [0,1].

    Staged like the oracle's CTE so each expensive expression runs ONCE
    per row: stage 1 computes the token count, stopword ratio, and punct
    ratio as columns (one split, one stopword filter, one regexp_replace);
    stage 2 composes the quality score from those columns. The flat form
    (three helper calls in one projection) re-evaluated the regex and the
    stopword membership scan inside quality_score — measured 9.4s → ~4s
    on 600k docs at sf1 (the r5 scaling-curve outlier; linear either way,
    but per-row constant halved)."""
    d = load_table(spark, sf_dir, "documents")
    # r6: the token ARRAY itself is staged too — stopword_ratio(text)
    # references tokenize(text) three times internally (size guard, filter
    # source, divisor) and token_count once more; computing the array once
    # as a column and deriving n/swr from the reference shaves ~13% off the
    # per-row constant at sf1 (3.3s → 2.9s on 50k docs, same results)
    from sparkfulltextquery_spark.functions.text import tokenize
    from sparkfulltextquery_spark.textstats import STOPWORDS

    s0 = d.select("doc_id", "text", tokenize(F.col("text")).alias("_toks"))
    s = s0.select(
        "doc_id",
        F.size("_toks").cast("double").alias("_n"),
        F.when(F.size("_toks") == 0, F.lit(0.0))
        .otherwise(
            # isin → InSet hash probe per token (r9), not an O(|sw|) scan
            F.size(
                F.filter(F.col("_toks"), lambda t: t.isin(*STOPWORDS))
            ).cast("double")
            / F.size("_toks")
        )
        .alias("_swr"),
        punct_ratio(F.col("text")).alias("_pr"),
    )
    return s.select(
        "doc_id",
        F.round("_swr", 6).alias("stopword_ratio"),
        F.round("_pr", 6).alias("punct_ratio"),
        F.round(
            F.lit(0.4) * F.least(F.col("_n") / F.lit(50.0), F.lit(1.0))
            + F.lit(0.3) * F.least(F.col("_swr") / F.lit(0.4), F.lit(1.0))
            + F.lit(0.3) * (1 - F.col("_pr")),
            6,
        ).alias("quality"),
    )


def _lang_oracle() -> str:
    # same argmax/tie rules as textstats.lang_guess: iterate languages in
    # sorted order, strictly-greater wins
    parts = []
    for lang in sorted(LANG_MARKERS):
        markers = "[" + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"
        parts.append(
            f"len(list_filter({_TOK}, t -> list_contains({markers}, t))) AS hits_{lang}"
        )
    hits_cols = ", ".join(parts)
    langs = sorted(LANG_MARKERS)
    # fold: best = 'und'/0; for each lang, better iff hits > best_score
    expr_best = "'und'"
    expr_score = "0"
    for lang in langs:
        expr_best = f"(CASE WHEN hits_{lang} > {expr_score} THEN '{lang}' ELSE {expr_best} END)"
        expr_score = f"(CASE WHEN hits_{lang} > {expr_score} THEN hits_{lang} ELSE {expr_score} END)"
    return f"""
    WITH h AS (SELECT doc_id, {hits_cols} FROM documents WHERE doc_id < 300)
    SELECT doc_id, {expr_best} AS lang_guess FROM h
    """


@query("textstats_lang_guess", oracle=_lang_oracle())
def textstats_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID heuristic (n-gram-free variant — the
    synthetic corpus is word-salad, so markers are the robust signal)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return d.select("doc_id", lang_guess(F.col("text")).alias("lang_guess"))


@query(
    "textstats_fingerprint",
    oracle=f"""
    SELECT {fingerprint_duck('text')} AS fp,
           count(*)                   AS n_docs,
           min(doc_id)                AS canonical_id
    FROM documents
    GROUP BY 1
    HAVING count(*) > 1
    """,
)
def textstats_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: sorted-distinct-token md5 (OpenRefine
    fingerprint). Groups docs equal up to token order/multiplicity."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_id"))
        .filter(F.col("n_docs") > 1)
    )


@query(
    "textstats_by_source",
    oracle=f"""
    SELECT source, lang,
           count(*)                                   AS n_docs,
           round(avg(n_chars), 4)                     AS avg_chars,
           round(avg(len({_TOK})), 4)                 AS avg_tokens,
           min(n_chars)                               AS min_chars,
           max(n_chars)                               AS max_chars
    FROM documents
    GROUP BY source, lang
    """,
)
def textstats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling rollup by (source, lang) — the triage query a data
    pipeline runs before filtering."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(token_count(F.col("text"))), 4).alias("avg_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


_PMI_ORACLE = f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents),
    uni AS (SELECT unnest(t) AS w FROM tok),
    ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
    un AS (SELECT sum(c) AS n FROM ucnt),
    bi AS (SELECT unnest({ngrams_duck("t", n=2)}) AS bg FROM tok),
    bcnt AS (SELECT bg, count(*) AS c FROM bi GROUP BY bg),
    bn AS (SELECT sum(c) AS m FROM bcnt)
    SELECT bg AS bigram, bcnt.c AS pair_count,
           round(ln((bcnt.c / bn.m)
                    / ((a.c / un.n) * (b.c / un.n))), 6) AS pmi
    FROM bcnt
    JOIN ucnt a ON a.w = string_split(bg, ' ')[1]
    JOIN ucnt b ON b.w = string_split(bg, ' ')[2]
    CROSS JOIN un CROSS JOIN bn
    WHERE bcnt.c >= 20
"""


@query("textstats_collocations_pmi", oracle=_PMI_ORACLE)
def textstats_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction via pointwise mutual information:
    PMI(a,b) = ln(p(ab) / (p(a) p(b))) over corpus bigrams, reported for
    bigrams occurring ≥20 times. High-PMI pairs are multiword expressions —
    the phrase-vocabulary step of a text pipeline (and the statistical
    grounding for the reference's NGram transformer, NGram.scala:37).

    Scale: two grouped counts (unigrams, bigrams) + two broadcast scalar
    totals + two equi-joins of the bigram relation against the (small)
    unigram relation on each component word — shuffle-parallel end to end."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(tokenize(F.col("text")).alias("t"))
    uni = tok.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    un = uni.agg(F.sum("c").alias("n"))
    bi = tok.select(F.explode(ngrams(F.col("t"), n=2)).alias("bg")).groupBy("bg").agg(
        F.count(F.lit(1)).alias("c")
    )
    bn = bi.agg(F.sum("c").alias("m"))
    a = uni.select(F.col("w").alias("wa"), F.col("c").alias("ca"))
    b = uni.select(F.col("w").alias("wb"), F.col("c").alias("cb"))
    return (
        bi.filter(F.col("c") >= 20)
        .withColumn("wa", F.split("bg", " ")[0])
        .withColumn("wb", F.split("bg", " ")[1])
        .join(a, "wa")
        .join(b, "wb")
        .join(F.broadcast(un))
        .join(F.broadcast(bn))
        .select(
            F.col("bg").alias("bigram"),
            F.col("c").alias("pair_count"),
            F.round(
                F.log(
                    (F.col("c") / F.col("m"))
                    / ((F.col("ca") / F.col("n")) * (F.col("cb") / F.col("n")))
                ),
                6,
            ).alias("pmi"),
        )
    )


_ZIPF_ORACLE = f"""
    WITH tf AS (
      SELECT t AS term, count(*) AS freq
      FROM (SELECT unnest({_TOK}) AS t FROM documents)
      GROUP BY t HAVING count(*) >= 5
    ),
    ranked AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, term) AS rank
      FROM tf
    )
    SELECT count(*) AS n_terms,
           round(regr_slope(ln(freq), ln(rank)), 4) AS zipf_slope,
           round(regr_r2(ln(freq), ln(rank)), 4) AS zipf_r2
    FROM ranked
"""


@query("textstats_zipf_fit", oracle=_ZIPF_ORACLE)
def textstats_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope and R² of ln(freq) against ln(rank) over
    the term frequency distribution (min count 5) — the standard
    corpus-health diagnostic (natural text sits near slope -1; boilerplate
    or synthetic floods bend it). One term-count shuffle, a rank window
    over the bounded vocabulary, then a single-row regr_slope/regr_r2
    aggregate (map-side partial moments)."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(tokenize("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= 5)
    )
    from pyspark.sql import Window as W

    ranked = tf.select(
        "freq",
        F.row_number()
        .over(W.orderBy(F.col("freq").desc(), "term"))
        .alias("rank"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(F.log("freq"), F.log("rank")), 4).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("freq"), F.log("rank")), 4).alias("zipf_r2"),
    )


@query(
    "textstats_readability",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             len({_TOK}) AS n_words,
             len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                             s -> trim(s) <> '')) AS n_sents,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
      FROM documents WHERE doc_id < 500
    )
    SELECT doc_id, n_words, n_sents, n_syll,
           round(206.835 - 1.015 * (n_words / greatest(n_sents, 1))
                         - 84.6 * (n_syll / greatest(n_words, 1)), 4) AS flesch
    FROM base
    """,
)
def textstats_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the corpus-quality signal used
    by readability-gated training-data filters: words from the shared
    tokenizer, sentences by [.!?]+ splitting, syllables by the standard
    vowel-group heuristic (maximal [aeiouy]+ runs, counted with the SAME
    regex in both engines via regexp_count / regexp_extract_all).

        flesch = 206.835 − 1.015·(W/S) − 84.6·(SYL/W)

    All three components are exact integers; the score is one fixed
    IEEE expression over them rounded at 4dp (the cross-engine float
    discipline: never round derived ratios upstream). Per-row map-side
    work only — no shuffle at any corpus size."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    base = d.select(
        "doc_id",
        F.size(tokenize(F.col("text"))).alias("n_words"),
        F.size(
            F.filter(
                F.split(F.col("text"), r"[.!?]+"),
                lambda s: F.trim(s) != "",
            )
        ).alias("n_sents"),
        F.expr("regexp_count(lower(text), '[aeiouy]+')").alias("n_syll"),
    )
    return base.select(
        "doc_id",
        "n_words",
        "n_sents",
        "n_syll",
        F.round(
            F.lit(206.835)
            - F.lit(1.015)
            * (F.col("n_words") / F.greatest(F.col("n_sents"), F.lit(1)))
            - F.lit(84.6)
            * (F.col("n_syll") / F.greatest(F.col("n_words"), F.lit(1))),
            4,
        ).alias("flesch"),
    )


@query(
    "textstats_gopher_repetition",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, lang, unnest({ngrams_duck(_TOK, 2)}) AS g FROM documents
    ),
    per AS (
      SELECT doc_id, lang, g, count(*) AS c FROM grams GROUP BY doc_id, lang, g
    ),
    doc AS (
      SELECT doc_id, lang,
             CAST(sum(c) AS BIGINT) AS total,
             count(*) AS n_distinct,
             CAST(max(c) AS BIGINT) AS top
      FROM per GROUP BY doc_id, lang
    )
    SELECT lang,
           count(*) AS n_docs,
           count(*) FILTER (WHERE (total - n_distinct) * 5 > total
                               OR top * 10 > total) AS n_flagged,
           CAST(sum(total) AS BIGINT) AS total_bigrams,
           CAST(sum(total - n_distinct) AS BIGINT) AS dup_bigrams,
           CAST(sum(top) AS BIGINT) AS top_bigrams
    FROM doc GROUP BY lang
    """,
)
def textstats_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText repetition-quality signals (Rae et al. 2021,
    'Scaling Language Models', Table A1 — the duplicate-n-gram family
    every LLM curation pipeline applies): per document, the fraction of
    bigram occurrences that are duplicates and the share of the single
    most frequent bigram; a doc is FLAGGED when dup-fraction > 0.2 or
    top-bigram share > 0.1 (integer cross-multiplication — no float
    thresholds cross engines). Rolled up per language: doc counts,
    flagged counts, and the exact integer bigram tallies.

    Scale shape: one explode over bigrams with a two-stage hash
    aggregation ((doc, gram) partial+final, then (doc), then (lang)) —
    map-side combine keeps shuffle volume at O(distinct bigrams/doc);
    lang rides the rows so no corpus join. Docs with <2 tokens have no
    bigram and are excluded (documented; the length-based quality row
    already screens those).

    Measured A/B (r7, sf0.1 local[32]): a shuffle-free rewrite via
    per-row array expressions (sort_array + zip_with equal-adjacent +
    F.aggregate run-length accumulators) ran 24s vs this form's 5.7s —
    Spark's higher-order-function lambdas evaluate interpreted per
    element (~12s per F.aggregate over the corpus) while the exploded
    form stays inside Tungsten's codegen'd hash aggregation. The shuffle
    is the cheaper side of that trade at every measured scale, and it
    parallelizes; keep the explode.

    The token array is STAGED as a column before ngrams (the Catalyst
    lambda-recompute pitfall: ngrams' transform re-evaluates its input
    expression per element, so inlining tokenize() there re-ran the
    regex split once per bigram — measured 4.4s; staged 0.5s)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", tokenize(F.col("text")).alias("tk"))
    grams = toks.select(
        "doc_id", "lang", F.explode(ngrams(F.col("tk"), 2)).alias("g")
    )
    per = grams.groupBy("doc_id", "lang", "g").agg(F.count(F.lit(1)).alias("c"))
    doc = per.groupBy("doc_id", "lang").agg(
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top"),
    )
    flagged = ((F.col("total") - F.col("n_distinct")) * 5 > F.col("total")) | (
        F.col("top") * 10 > F.col("total")
    )
    return doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(flagged, 1)).alias("n_flagged"),
        F.sum("total").alias("total_bigrams"),
        F.sum(F.col("total") - F.col("n_distinct")).alias("dup_bigrams"),
        F.sum("top").alias("top_bigrams"),
    )


_SENT_DUCK = "list_filter(regexp_split_to_array(text, '[.!?]+\\s*'), s -> s <> '')"


@query(
    "textstats_gopher_dup_sentences",
    oracle=f"""
    WITH sents AS (
      SELECT doc_id, lang, unnest({_SENT_DUCK}) AS sent FROM documents
    ),
    doc AS (
      SELECT doc_id, lang, count(*) AS total, count(DISTINCT sent) AS n_distinct
      FROM sents GROUP BY doc_id, lang
    )
    SELECT lang,
           count(*) AS n_docs,
           count(*) FILTER (WHERE (total - n_distinct) * 10 > 3 * total)
             AS n_flagged,
           CAST(sum(total) AS BIGINT) AS total_sents,
           CAST(sum(total - n_distinct) AS BIGINT) AS dup_sents
    FROM doc GROUP BY lang
    """,
)
def textstats_gopher_dup_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher duplicate-line rule (Rae et al. 2021 Table A1: drop docs
    whose duplicate-line fraction exceeds 0.30), applied at sentence
    granularity (the corpus's line unit — same [.!?] splitter as the Hive
    sentence twins): per doc, the fraction of sentence occurrences that
    are duplicates of an earlier identical sentence; flagged when
    dup-fraction > 0.3, as exact integer cross-multiplication. Per-lang
    rollup with exact integer tallies.

    Scale: split is per-row; (doc, sent) dedup is one hash aggregation
    with map-side combine; lang rides the rows — no corpus join.

    Corpus note (honesty over vanity): the synthetic documents carry no
    sentence punctuation, so every doc is ONE sentence here and the flag
    count is 0 at every scale — the rule's aggregation pipeline is still
    exercised end-to-end against the oracle (counts/tallies are
    non-degenerate); on a real corpus the same plan fires the 0.3 gate.
    The bigram-level repetition rule above is the discriminative twin on
    this corpus (its duplicate tallies are non-zero)."""
    d = load_table(spark, sf_dir, "documents")
    sents = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split(F.col("text"), r"[.!?]+\s*"), lambda s: s != "")
        ).alias("sent"),
    )
    doc = sents.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct("sent").alias("n_distinct"),
    )
    flagged = (F.col("total") - F.col("n_distinct")) * 10 > 3 * F.col("total")
    return doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(flagged, 1)).alias("n_flagged"),
        F.sum("total").alias("total_sents"),
        F.sum(F.col("total") - F.col("n_distinct")).alias("dup_sents"),
    )
