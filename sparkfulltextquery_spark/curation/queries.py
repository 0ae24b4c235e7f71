"""Registered curation queries + DuckDB oracles.

Scale notes per query are inline; the common theme: the only shuffles are
key-partitioned (doc_id / source), the eval side of the contamination join
is broadcast, and every per-document computation is a bounded array
expression (no Python, no driver state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sparkfulltextquery_spark.functions.text import (
    ngrams,
    ngrams_duck,
    tokenize,
    tokenize_duck,
)
from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table

_TOK = tokenize_duck("text")

# --------------------------------------------------------------------------
# 1. Benchmark-contamination check: token-8-gram overlap between the train
#    split and a (deterministically chosen) eval split.
# --------------------------------------------------------------------------

_CONTAM_K = 8
_SH8 = ngrams_duck(_TOK, n=_CONTAM_K)

_CONTAM_ORACLE = f"""
    WITH tok AS (SELECT doc_id, list_distinct({_SH8}) AS sh FROM documents),
    e AS (SELECT DISTINCT unnest(sh) AS s FROM tok WHERE doc_id % 19 = 0),
    t AS (SELECT doc_id, unnest(sh) AS s FROM tok WHERE doc_id % 19 <> 0),
    tot AS (SELECT doc_id, count(*) AS n_shingles FROM t GROUP BY doc_id),
    hit AS (SELECT t.doc_id, count(*) AS n_hit
            FROM t JOIN e ON t.s = e.s GROUP BY t.doc_id)
    SELECT h.doc_id, tot.n_shingles, h.n_hit,
           round(h.n_hit::DOUBLE / tot.n_shingles, 6) AS contamination
    FROM hit h JOIN tot ON h.doc_id = tot.doc_id
"""


@query("curation_contamination_check", oracle=_CONTAM_ORACLE)
def curation_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval n-gram overlap (the decontamination step of an LLM data
    pipeline): docs with doc_id % 19 == 0 stand in for a benchmark eval set;
    every train doc is scored by how many of its distinct token-8-grams
    appear anywhere in the eval set.

    Scale: the eval set is tiny relative to the corpus → its distinct
    shingle set is **broadcast**, so the train side never shuffles; the only
    exchange is the per-doc groupBy. At 100 TB the eval shingles of a real
    benchmark suite are a few million strings — still broadcast range.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.array_distinct(ngrams(tokenize("text"), n=_CONTAM_K)).alias("sh")
    )
    ev = (
        sh.filter(F.col("doc_id") % 19 == 0)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    tr = sh.filter(F.col("doc_id") % 19 != 0).select(
        "doc_id", F.explode("sh").alias("s")
    )
    hit = (
        tr.join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    tot = tr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return hit.join(tot, "doc_id").select(
        "doc_id",
        "n_shingles",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_shingles"), 6).alias("contamination"),
    )


# --------------------------------------------------------------------------
# 2. Sequence packing: concat-then-chunk document packing into fixed-size
#    token windows (the GPT-style pretraining batch layout).
# --------------------------------------------------------------------------

_PACK_CAP = 2048

_PACK_ORACLE = f"""
    WITH t AS (SELECT source, doc_id, len({_TOK}) AS n_tokens FROM documents),
    c AS (SELECT source, doc_id, n_tokens,
            coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM t)
    SELECT source, doc_id, n_tokens,
           CAST(cum_before // {_PACK_CAP} AS BIGINT) AS seq_id,
           CAST(cum_before % {_PACK_CAP} AS BIGINT)  AS seq_offset
    FROM c
"""


@query("curation_pack_sequences", oracle=_PACK_ORACLE)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic concat-then-chunk packing: per source shard, documents
    are laid end-to-end in doc_id order; each doc lands in sequence
    ``seq_id`` at token offset ``seq_offset`` of a {cap}-token window
    (docs may straddle a boundary — exactly how GPT-style pipelines pack).

    Scale: one shuffle on ``source`` + an in-partition sort (window spills
    via UnsafeExternalSorter). Packing is per-shard by construction, so a
    100 TB corpus packs with shard-level parallelism — there is no global
    sequential state.
    """
    d = load_table(spark, sf_dir, "documents")
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        d.select("source", "doc_id", F.size(tokenize("text")).alias("n_tokens"))
        .withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            "source",
            "doc_id",
            "n_tokens",
            F.expr(f"cum_before div {_PACK_CAP}").alias("seq_id"),
            (F.col("cum_before") % _PACK_CAP).alias("seq_offset"),
        )
    )


# --------------------------------------------------------------------------
# 3. Repetition metrics (Gopher-style quality rules 4-7: fraction of the doc
#    covered by its most frequent unigram / bigram, distinct-token ratio).
# --------------------------------------------------------------------------

_BIGRAMS = ngrams_duck(_TOK, n=2)

_REPETITION_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, {_TOK} AS tok, {_BIGRAMS} AS bg
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           len(tok) AS n_tokens,
           round(len(list_distinct(tok))::DOUBLE / len(tok), 6) AS distinct_ratio,
           round(list_max(list_transform(list_distinct(tok),
                 u -> len(list_filter(tok, x -> x = u))))::DOUBLE / len(tok), 6)
             AS top_token_frac,
           round(list_max(list_transform(list_distinct(bg),
                 u -> len(list_filter(bg, x -> x = u))))::DOUBLE / len(bg), 6)
             AS top_bigram_frac
    FROM t WHERE len(tok) > 0 AND len(bg) > 0
"""


@query("curation_repetition_metrics", oracle=_REPETITION_ORACLE)
def curation_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher rules): most-frequent
    unigram/bigram coverage fraction and distinct-token ratio. High
    top-*-frac ⇒ boilerplate/spam; low distinct_ratio ⇒ keyword stuffing.

    Scale: shuffle-free — every metric is a bounded array expression over
    one document (O(distinct·n) per doc, n = doc length), fully codegen'd,
    embarrassingly parallel over the corpus.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    tok = tokenize("text")
    bg = ngrams(tokenize("text"), n=2)

    def _top_frac(arr):
        counts = F.transform(
            F.array_distinct(arr),
            lambda u: F.size(F.filter(arr, lambda x: x == u)),
        )
        return F.array_max(counts) / F.size(arr)

    return (
        d.select("doc_id", tok.alias("tok"), bg.alias("bg"))
        .filter((F.size("tok") > 0) & (F.size("bg") > 0))
        .select(
            "doc_id",
            F.size("tok").alias("n_tokens"),
            F.round(
                F.size(F.array_distinct("tok")) / F.size("tok"), 6
            ).alias("distinct_ratio"),
            F.round(_top_frac(F.col("tok")), 6).alias("top_token_frac"),
            F.round(_top_frac(F.col("bg")), 6).alias("top_bigram_frac"),
        )
    )


# --------------------------------------------------------------------------
# 4. PII redaction: regex scrub of emails/phone numbers with match counts.
# --------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"

# The synthetic corpus is PII-free, so both engines plant the same
# deterministic contacts in a slice of docs before scrubbing.
_PII_AUG_DUCK = (
    "CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || doc_id "
    "|| '@example.com or call 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') "
    "|| '-0199 now' ELSE text END"
)

_PII_ORACLE = f"""
    WITH aug AS (
      SELECT doc_id, {_PII_AUG_DUCK} AS text
      FROM documents WHERE doc_id < 400
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
           regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM aug
"""


@query("curation_pii_redaction", oracle=_PII_ORACLE)
def curation_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count and redact email/phone matches (regexp_count +
    chained regexp_replace — reference RegExpReplace/RegExpExtractAll,
    regexpExpressions.scala). Patterns kept to the Java∩RE2 regex subset so
    the oracle is exact.

    Scale: shuffle-free per-row transform, fully codegen'd."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    aug = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or call 555-"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-0199 now"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return aug.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(_PHONE_RE)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
    )


# --------------------------------------------------------------------------
# 5. Sliding-window token chunking: split documents into fixed-size
#    overlapping chunks — the context-window preparation step of an LLM
#    training pipeline (each chunk becomes one training sequence).
# --------------------------------------------------------------------------

_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24  # overlap = SIZE - STRIDE = 8 tokens

_CHUNK_ORACLE = f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS t FROM documents WHERE doc_id < 300),
    spans AS (
      SELECT doc_id, t,
             unnest(range(0, greatest(1,
               CAST(ceil((len(t) - {_CHUNK_SIZE - _CHUNK_STRIDE})
                         / {_CHUNK_STRIDE}.0) AS BIGINT)))) AS chunk_id
      FROM tok)
    SELECT doc_id, chunk_id,
           CAST(len(t[(chunk_id * {_CHUNK_STRIDE} + 1)
                      :(chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE})]) AS BIGINT)
             AS n_tokens,
           array_to_string(t[(chunk_id * {_CHUNK_STRIDE} + 1)
                             :(chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE})], ' ')
             AS chunk_text
    FROM spans
"""


@query("curation_chunk_documents", oracle=_CHUNK_ORACLE)
def curation_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking (size 32, stride 24): every doc
    yields ceil((n_tokens - overlap) / stride) chunks, the last one ragged.
    The 1→N expansion is a Generate over a bounded ``sequence`` — the
    reference's GenerateExec shape (execution/GenerateExec.scala:50) driven
    by arithmetic, not data, so it never materializes per-token rows.

    Scale: shuffle-free (pure per-row expansion); chunk count is
    len/stride ≈ 1.3× row growth, not the |tokens|× growth of a
    posexplode-based chunker."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    overlap = _CHUNK_SIZE - _CHUNK_STRIDE
    t = tokenize(F.col("text"))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(t) - F.lit(overlap)) / F.lit(float(_CHUNK_STRIDE))),
    )
    d = d.select(
        "doc_id",
        t.alias("t"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("long"))).alias("chunk_id"),
    )
    chunk = F.slice(F.col("t"), (F.col("chunk_id") * _CHUNK_STRIDE + 1).cast("int"), _CHUNK_SIZE)
    return d.select(
        "doc_id",
        "chunk_id",
        F.size(chunk).cast("long").alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


# --------------------------------------------------------------------------
# 6. Deterministic source-mixture sampling: per-domain keep rates applied
#    via a portable content hash — the "data mixing" step that reweights
#    domains (web/wiki/books/...) before training. Reproducible across
#    engines and runs: membership is a pure function of (source, doc_id).
# --------------------------------------------------------------------------

_MIX_WEIGHTS = {"src0": 100, "src1": 100, "src2": 75, "src3": 75, "src4": 50}
_MIX_DEFAULT = 20  # percent kept for any source not in the map

_MIX_CASE = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {w}" for s, w in _MIX_WEIGHTS.items())
    + f" ELSE {_MIX_DEFAULT} END"
)

_MIX_ORACLE = f"""
    SELECT source,
           count(*) AS n_total,
           count(CASE WHEN
             ('0x' || substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 100 < {_MIX_CASE}
             THEN 1 END) AS n_kept
    FROM documents
    GROUP BY source
"""


@query("curation_source_mixture", oracle=_MIX_ORACLE)
def curation_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted per-source downsampling with a portable md5 hash gate
    (functions.hashes.h60): keep doc iff h(source:doc_id) % 100 < weight%.
    Unlike df.sample this is deterministic, engine-independent, and
    join-stable — the same doc is kept in every run and on every engine,
    which is what makes training-data mixtures reproducible.

    Scale: one partial+final aggregation; the hash gate is a codegen'd
    row-local expression (no sampling state, no seed coordination across
    executors)."""
    from sparkfulltextquery_spark.functions.hashes import h60

    d = load_table(spark, sf_dir, "documents")
    weight = F.lit(_MIX_DEFAULT)
    for s, w in reversed(_MIX_WEIGHTS.items()):
        weight = F.when(F.col("source") == s, F.lit(w)).otherwise(weight)
    gate = h60(F.concat_ws(":", "source", F.col("doc_id").cast("string"))) % 100 < weight
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(gate, 1)).alias("n_kept"),
        )
    )


# --------------------------------------------------------------------------
# 7. Capstone: the end-to-end training-data pipeline — exact dedup →
#    decontamination → quality gate → deterministic mixture → chunking,
#    as ONE composed relation (what a user actually runs nightly).
# --------------------------------------------------------------------------

_PIPE_ORACLE = f"""
    WITH base AS (SELECT doc_id, source, text, {_TOK} AS t FROM documents),
    -- 1. exact dedup: canonical (min doc_id) per content hash
    dedup AS (
      SELECT min(doc_id) AS doc_id FROM base GROUP BY md5(text)),
    -- 2. decontamination: drop docs sharing a token-8-gram with the eval
    --    slice (doc_id % 19 = 0), and the eval slice itself
    evalgrams AS (
      SELECT DISTINCT unnest(list_distinct({_SH8})) AS s
      FROM base WHERE doc_id % 19 = 0),
    contaminated AS (
      SELECT DISTINCT b.doc_id
      FROM (SELECT doc_id, unnest(list_distinct({_SH8})) AS s
            FROM base WHERE doc_id % 19 <> 0) b
      JOIN evalgrams e ON b.s = e.s),
    -- 3. quality gate: >= 20 tokens
    -- 4. deterministic mixture: md5 gate at per-source weight
    kept AS (
      SELECT b.doc_id, b.source, b.t
      FROM base b
      JOIN dedup d ON b.doc_id = d.doc_id
      WHERE b.doc_id % 19 <> 0
        AND b.doc_id NOT IN (SELECT doc_id FROM contaminated)
        AND len(b.t) >= 20
        AND ('0x' || substr(md5(b.source || ':' || CAST(b.doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 100 < {_MIX_CASE.replace("source", "b.source")}),
    -- 5. sliding-window chunks (size 32, stride 24)
    spans AS (
      SELECT doc_id, source, t,
             unnest(range(0, greatest(1,
               CAST(ceil((len(t) - {_CHUNK_SIZE - _CHUNK_STRIDE})
                         / {_CHUNK_STRIDE}.0) AS BIGINT)))) AS chunk_id
      FROM kept)
    SELECT doc_id, source, chunk_id,
           CAST(len(t[(chunk_id * {_CHUNK_STRIDE} + 1)
                      :(chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE})]) AS BIGINT)
             AS n_tokens,
           md5(array_to_string(t[(chunk_id * {_CHUNK_STRIDE} + 1)
                                 :(chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE})], ' '))
             AS chunk_md5
    FROM spans
"""


@query("pipeline_training_data", oracle=_PIPE_ORACLE)
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as one composed DataFrame: exact dedup
    (content-hash groupBy, canonical min doc_id) → benchmark
    decontamination (8-gram anti-join against the eval slice) → quality
    gate (≥20 tokens) → deterministic per-source mixture (md5 gate) →
    sliding-window chunking. Output is the training-sequence relation
    (doc, source, chunk, token count, content address).

    Every stage is a shuffle-parallel relational op — dedup and
    decontamination are aggregations/anti-joins on content keys, the gates
    are row-local, chunking is an arithmetic Generate. One linear pass, no
    driver state; at 100 TB each arrow in the chain is the already-analyzed
    operator (see SCALE.md)."""
    from sparkfulltextquery_spark.functions.hashes import h60

    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "source", "text", tokenize(F.col("text")).alias("t"))

    canonical = base.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))

    grams = F.array_distinct(ngrams(F.col("t"), n=_CONTAM_K))
    evalgrams = (
        base.filter(F.col("doc_id") % 19 == 0)
        .select(F.explode(grams).alias("s"))
        .distinct()
    )
    train_grams = base.filter(F.col("doc_id") % 19 != 0).select(
        "doc_id", F.explode(grams).alias("s")
    )
    contaminated = train_grams.join(evalgrams, "s").select("doc_id").distinct()

    weight = F.lit(_MIX_DEFAULT)
    for s, w in reversed(_MIX_WEIGHTS.items()):
        weight = F.when(F.col("source") == s, F.lit(w)).otherwise(weight)
    gate = h60(F.concat_ws(":", "source", F.col("doc_id").cast("string"))) % 100 < weight

    kept = (
        base.filter(F.col("doc_id") % 19 != 0)
        .join(canonical.select("doc_id"), "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
        .filter((F.size("t") >= 20) & gate)
    )

    overlap = _CHUNK_SIZE - _CHUNK_STRIDE
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size("t") - F.lit(overlap)) / F.lit(float(_CHUNK_STRIDE))),
    )
    spans = kept.select(
        "doc_id",
        "source",
        "t",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("long"))).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("t"), (F.col("chunk_id") * _CHUNK_STRIDE + 1).cast("int"), _CHUNK_SIZE
    )
    return spans.select(
        "doc_id",
        "source",
        "chunk_id",
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


# --------------------------------------------------------------------------
# 8. Deterministic global shuffle: reproducible training order.
# --------------------------------------------------------------------------

_SHUFFLE_ORACLE = """
    SELECT doc_id, source,
           CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                AS BIGINT) AS train_pos
    FROM documents
"""


@query("curation_global_shuffle", oracle=_SHUFFLE_ORACLE)
def curation_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible training order: every doc gets a global position by
    sorting on a content hash — a deterministic permutation (same order
    every run/engine) instead of rand(), so a training run can resume and
    re-shard without reshuffling history.

    Scale: Spark plans the global row_number over a RANGE-partitioned sort
    (no single-partition collapse for the sort itself; the window's final
    numbering is the one necessarily-serial pass). For pure sharding at
    100 TB, skip the global numbering and use the hash itself as sort key +
    repartitionByRange — same order, fully parallel (the rewrite
    demonstrated by functions.layout.zorder_rewrite)."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    from pyspark.sql import Window as W2

    w = W2.orderBy(h, "doc_id")
    return d.select(
        "doc_id", "source", F.row_number().over(w).cast("long").alias("train_pos")
    )


# --------------------------------------------------------------------------
# 8. Model-based quality scoring: hashed-feature linear classifier as pure
#    column expressions (curation/classifier.py).
# --------------------------------------------------------------------------

from sparkfulltextquery_spark.curation.classifier import (  # noqa: E402
    quality_logit_oracle,
    quality_logit_score,
)


@query("curation_quality_classifier", oracle=quality_logit_oracle("documents"))
def curation_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document scored by the hashed linear model: the model ships as
    a literal array inside the plan (no broadcast, no UDF); two
    key-partitioned shuffles regardless of corpus size."""
    return quality_logit_score(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# 9. Boilerplate mining: token n-grams repeated across many distinct
#    documents (headers / disclaimers / template text). Cross-doc
#    complement of the within-doc repetition metrics above.
# --------------------------------------------------------------------------

_BOILER_K = 6
_BOILER_MIN_DOCS = 3
_BOILER_TOP = 20


@query(
    "curation_boilerplate_ngrams",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({ngrams_duck(_TOK, n=_BOILER_K)}) AS gram
      FROM documents
    ),
    agg AS (
      SELECT gram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_total
      FROM sh GROUP BY gram
    )
    SELECT gram, n_docs, n_total
    FROM agg WHERE n_docs >= {_BOILER_MIN_DOCS}
    ORDER BY n_docs DESC, n_total DESC, gram ASC
    LIMIT {_BOILER_TOP}
    """,
)
def curation_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top cross-document repeated 6-grams: grams occurring in >= 3
    distinct docs, ranked by document reach — the detection relation a
    boilerplate-removal pass consumes (removal itself is then an anti-join /
    regexp strip against this list).

    Scale: one hash shuffle on gram with map-side partial aggregation; the
    multi-distinct (n_docs + n_total in one pass) uses Spark's expand
    rewrite. Top-k is a TakeOrderedAndProject bounded heap — no global
    sort. At 100 TB the gram key space is large but uniform (no skew:
    boilerplate grams are the heavy keys, and AQE splits them)."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.explode(ngrams(tokenize("text"), n=_BOILER_K)).alias("gram"))
    agg = sh.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_total"),
    )
    return (
        agg.filter(F.col("n_docs") >= _BOILER_MIN_DOCS)
        .orderBy(F.desc("n_docs"), F.desc("n_total"), F.asc("gram"))
        .limit(_BOILER_TOP)
    )


# --------------------------------------------------------------------------
# BPE-style pair statistics: the inner loop of tokenizer training — count
# adjacent symbol pairs within words across the corpus; the most frequent
# pair is the next merge. One explode chain, one groupBy: shuffle volume
# O(distinct pairs), map-side combined; at 100 TB this is the same plan,
# just more partitions (no driver state, no iteration here — one round).
# --------------------------------------------------------------------------

_BPE_ORACLE = f"""
    WITH words AS (
      SELECT unnest({_TOK}) AS w FROM documents WHERE doc_id % 5 = 0
    ),
    chars AS (SELECT split(w, '') AS cs FROM words WHERE len(w) >= 2),
    pairs AS (
      SELECT unnest(list_transform(range(1, len(cs)), i -> cs[i] || cs[i + 1]))
        AS pair
      FROM chars
    )
    SELECT pair, count(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 25
"""


@query("curation_bpe_pair_counts", oracle=_BPE_ORACLE)
def curation_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of BPE tokenizer training: adjacent character-pair counts
    within words (on a 1-in-5 doc sample), top-25 merge candidates.

    r12: the adjacent pair c[i]c[i+1] IS substring(w, i, 2), so the pair
    relation is explode(sequence(1, len-1)) → substring — two fully
    codegen'd expressions. The previous spelling (split to a char array,
    two slices, zip_with concat) ran the zip_with as an interpreted
    CodegenFallback with a per-word array allocation chain — measured
    5.4 → 0.61s at sf10 (0.87 → 0.48 at sf1), identical counts."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    words = d.select(F.explode(tokenize(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.expr("explode(sequence(1, length(w) - 1))").alias("i"), "w"
    ).select(F.expr("substring(w, i, 2)").alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# Unigram log-probability scoring: rank documents by average per-token
# -log2 p(token) under the corpus's own unigram LM — the cheap perplexity
# proxy used to filter incoherent text before expensive model scoring.
# The LM table is a broadcast join (vocab ≪ corpus); per-doc aggregation
# is one key-partitioned shuffle.
# --------------------------------------------------------------------------

_UNIGRAM_ORACLE = f"""
    WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
    lm AS (
      SELECT term, count(*) AS cf FROM tok GROUP BY term
    ),
    tot AS (SELECT sum(cf) AS n_tokens FROM lm),
    scored AS (
      SELECT tok.doc_id, -log2(lm.cf / tot.n_tokens) AS nll
      FROM tok JOIN lm USING (term) CROSS JOIN tot
    )
    SELECT doc_id, round(avg(nll), 4) AS avg_nll, count(*) AS n_tokens
    FROM scored GROUP BY doc_id
    ORDER BY avg_nll DESC, doc_id LIMIT 50
"""


@query("curation_unigram_logprob", oracle=_UNIGRAM_ORACLE)
def curation_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring: avg -log2 p(token) per document
    under the corpus unigram LM; the 50 most surprising documents surface
    first (out-of-distribution / junk detector). The LM is derived from the
    same one-pass token relation and broadcast into the scoring join."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokenize(F.col("text"))).alias("term"))
    lm = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    n_tokens = lm.agg(F.sum("cf").alias("n_tokens"))
    return (
        tok.join(F.broadcast(lm), "term")
        .crossJoin(F.broadcast(n_tokens))
        .withColumn("nll", -F.log2(F.col("cf") / F.col("n_tokens")))
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("nll"), 4).alias("avg_nll"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .orderBy(F.col("avg_nll").desc(), F.col("doc_id"))
        .limit(50)
    )


# --------------------------------------------------------------------------
# Full BPE vocabulary learner: K merge rounds unrolled DECLARATIVELY — the
# iterative tokenizer-training loop (count pairs → pick argmax → apply
# merge → repeat) as pure relational algebra. Each round's top pair is a
# one-row subquery cross-joined (broadcast) into the merge application; no
# driver collect, no Python loop over data — only the plan unrolls.
#
# Portability trick: a word's symbol sequence is a string with symbols
# joined by TWO spaces and single-space edges ('<w> a  b  c </w>'-style:
# ' a  b  c '). Greedy left-to-right pair merging is then a plain
# replace(' a  b ', ' ab '): adjacent matches never share consumed
# characters (each boundary has two spaces, the pattern consumes one from
# each side), so runs like 'a a a a' merge to 'aa aa' in one pass — the
# exact greedy-BPE semantics — with no regex lookarounds (DuckDB's RE2 has
# none; replace() behaves identically in both engines).
#
# Scale: vocab is a bounded relation (top-V words); each round is one
# pair-count groupBy over O(V) rows + a 1-row broadcast — corpus touched
# once to build the vocabulary. Reference anchor: the fork's tokenizer
# seed (`sentences`, stringExpressions.scala:1393) and mllib's iterative
# training discipline; the one-round pair count is curation_bpe_pair_counts.
# --------------------------------------------------------------------------

_BPE_ROUNDS = 6
_BPE_VOCAB = 500


def _bpe_with_chain(rounds: int = _BPE_ROUNDS, vocab: int = _BPE_VOCAB) -> str:
    """The shared WITH chain: vocab → s0 → (p_r, t_r, s_r) × rounds."""
    ctes = [
        f"""words AS (
      SELECT unnest({_TOK}) AS w FROM documents
    ),
    vocab AS (
      SELECT w, count(*) AS freq FROM words WHERE len(w) >= 2
      GROUP BY w ORDER BY freq DESC, w LIMIT {vocab}
    ),
    s0 AS (
      SELECT ' ' || rtrim(regexp_replace(w, '(.)', '\\1  ', 'g')) || ' ' AS sym,
             freq
      FROM vocab
    )"""
    ]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        ctes.append(f"""p{r} AS (
      SELECT p.a AS a, p.b AS b, freq
      FROM (SELECT string_split(trim(sym, ' '), '  ') AS arr, freq FROM {prev}),
           unnest(list_transform(range(1, len(arr)),
                                 i -> struct_pack(a := arr[i], b := arr[i + 1]))) AS t(p)
    ),
    t{r} AS (
      SELECT a, b, sum(freq) AS cnt FROM p{r}
      GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1
    ),
    s{r} AS (
      SELECT replace(sym, ' ' || t.a || '  ' || t.b || ' ',
                          ' ' || t.a || t.b || ' ') AS sym, freq
      FROM {prev} CROSS JOIN t{r} t
    )""")
    return "WITH " + ",\n    ".join(ctes)


def _bpe_oracle(rounds: int = _BPE_ROUNDS, vocab: int = _BPE_VOCAB) -> str:
    unions = "\n      UNION ALL ".join(
        f"SELECT {r} AS round, a, b, a || b AS merged, CAST(cnt AS BIGINT) AS cnt FROM t{r}"
        for r in range(1, rounds + 1)
    )
    return _bpe_with_chain(rounds, vocab) + f"\n    {unions}\n    ORDER BY round"


@query("curation_bpe_learn", oracle=_bpe_oracle())
def curation_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, {K} greedy merges over the top-{V} word
    vocabulary: returns the learned merge table (round, a, b, merged, cnt)
    — the artifact an LLM data pipeline ships to its tokenizer. See the
    block comment above for the declarative-unroll and double-space
    portability design."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(tokenize(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(_BPE_VOCAB)
    )
    sym0 = F.concat(
        F.lit(" "), F.rtrim(F.regexp_replace("w", "(.)", "$1  ")), F.lit(" ")
    )
    # r12: materialize the 500-row weighted vocabulary ONCE (localCheckpoint
    # = one tiny job) so the K merge rounds iterate over an in-memory
    # relation instead of re-planning the corpus tokenize+groupBy subtree
    # under every round; and resolve each round's 1-ROW argmax with a
    # bounded collect (the mllib iterative-trainer discipline — KMeans
    # collects k centroids per round) so the merge application is a literal
    # replace instead of a crossJoin chain whose plan grows per round.
    # Measured at sf0.1: 1.91 → 0.99s, identical merge table. At 100 TB the
    # corpus pass (vocabulary build) and the per-round pair-count aggregate
    # still run Spark-side; only the single winning pair crosses to the
    # driver per round.
    state = vocab.select(sym0.alias("sym"), "freq").localCheckpoint(eager=True)
    merges = []
    for r in range(1, _BPE_ROUNDS + 1):
        arr = F.split(F.trim(F.col("sym")), "  ")
        pairs = state.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(arr, 1, F.size(arr) - 1),
                    F.slice(arr, 2, F.size(arr) - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            # no pair left anywhere: the pre-r12 crossJoin-with-empty left
            # the state (and every later round) empty — mirror that exactly
            state = state.limit(0)
            continue
        t = top[0]
        merges.append((r, t["a"], t["b"], t["a"] + t["b"], t["cnt"]))
        state = state.select(
            F.replace(
                F.col("sym"),
                F.lit(f" {t['a']}  {t['b']} "),
                F.lit(f" {t['a']}{t['b']} "),
            ).alias("sym"),
            "freq",
        )
    return spark.createDataFrame(
        merges, "round int, a string, b string, merged string, cnt bigint"
    ).orderBy("round")


def _bpe_apply_oracle(rounds: int = _BPE_ROUNDS, vocab: int = _BPE_VOCAB) -> str:
    # reuse the learner's CTE chain, then score the FINAL state: weighted
    # symbol counts before/after the merges
    return (
        _bpe_with_chain(rounds, vocab)
        + f""",
    stats AS (
      SELECT (SELECT sum(freq * len(string_split(trim(sym, ' '), '  '))) FROM s0)
               AS syms_before,
             (SELECT sum(freq * len(string_split(trim(sym, ' '), '  ')))
              FROM s{rounds}) AS syms_after
    )
    SELECT CAST(syms_before AS BIGINT) AS syms_before,
           CAST(syms_after AS BIGINT) AS syms_after,
           round(syms_after / syms_before, 6) AS compression
    FROM stats"""
    )


@query("curation_bpe_apply", oracle=_bpe_apply_oracle())
def curation_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merge table back to the vocabulary and report
    the corpus-weighted symbol counts before/after and the compression
    ratio — the train→apply round trip an LLM tokenizer pipeline ships.
    Same declarative unroll as curation_bpe_learn; the 'apply' is the
    K-fold replace chain over the weighted vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(tokenize(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(_BPE_VOCAB)
    )
    sym0 = F.concat(
        F.lit(" "), F.rtrim(F.regexp_replace("w", "(.)", "$1  ")), F.lit(" ")
    )
    # r12: same checkpoint-the-vocab + 1-row-argmax-collect shape as
    # curation_bpe_learn (see the note there) — 2.15 → ~1.0s at sf0.1,
    # identical before/after/compression output
    state = vocab.select(sym0.alias("sym"), "freq").localCheckpoint(eager=True)
    n_syms = lambda c: F.size(F.split(F.trim(F.col(c)), "  "))  # noqa: E731
    before = state.agg(
        F.sum(F.col("freq") * n_syms("sym")).alias("syms_before")
    )
    for _ in range(_BPE_ROUNDS):
        arr = F.split(F.trim(F.col("sym")), "  ")
        pairs = state.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(arr, 1, F.size(arr) - 1),
                    F.slice(arr, 2, F.size(arr) - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            state = state.limit(0)
            continue
        t = top[0]
        state = state.select(
            F.replace(
                F.col("sym"),
                F.lit(f" {t['a']}  {t['b']} "),
                F.lit(f" {t['a']}{t['b']} "),
            ).alias("sym"),
            "freq",
        )
    after = state.agg(F.sum(F.col("freq") * n_syms("sym")).alias("syms_after"))
    return (
        before.crossJoin(after)
        .select(
            "syms_before",
            "syms_after",
            F.round(
                F.col("syms_after").cast("double") / F.col("syms_before"), 6
            ).alias("compression"),
        )
    )


from sparkfulltextquery_spark.functions.hashes import h28_duck as _h28_duck

_SPLIT_HASH = _h28_duck("'split:' || CAST(doc_id AS VARCHAR)") + " % 100"

_HASH_SPLIT_ORACLE = f"""
    WITH b AS (
      SELECT doc_id, len({_TOK}) AS n_tokens, {_SPLIT_HASH} AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM b GROUP BY 1
"""


@query("curation_hash_split", oracle=_HASH_SPLIT_ORACLE)
def curation_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by salted content-stable hash
    (the standard 90/5/5 pipeline split): bucket = h28('split:' || id) %
    100. Hash-assignment is reproducible across runs, cluster sizes and
    partitionings — unlike randomSplit, which is partition-dependent. One
    narrow projection + a 3-group aggregate; at 100 TB the split column
    is computed map-side and the output is typically written partitioned
    by it."""
    from sparkfulltextquery_spark.functions.hashes import h28

    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        h28(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), F.lit(100)
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), F.size(tokenize("text")).alias("n_tokens"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


_BUDGET_CAP = 20_000

_TOKEN_BUDGET_ORACLE = f"""
    WITH t AS (
      SELECT source, doc_id, len({_TOK}) AS n_tokens FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY n_tokens DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT source, doc_id, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= {_BUDGET_CAP}
"""


@query("curation_token_budget_cap", oracle=_TOKEN_BUDGET_ORACLE)
def curation_token_budget_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-capped selection: per source, take documents in (length
    desc, doc_id) priority order until the source's running token total
    hits the budget — the mixture-building primitive for "at most N
    tokens from each source". One hash-shuffle on source + a running-sum
    window (no global sort); at 100 TB a skewed giant source is the risk
    — the fix is pre-aggregating per (source, length-bucket) counts to
    find the cut length, then filtering map-side; the window form here is
    the per-source-bounded reference semantics."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "source", "doc_id", F.size(tokenize("text")).alias("n_tokens")
    )
    w = (
        W.partitionBy("source")
        .orderBy(F.col("n_tokens").desc(), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= _BUDGET_CAP)
    )
