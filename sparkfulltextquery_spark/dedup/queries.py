"""Registered dedup queries + DuckDB oracles.

Oracles are generated from the SAME constants (permutation table, shingle
size, bands, thresholds) as the Spark implementation, so the two engines
compute the identical algorithm by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.dedup import minhash as MH
from sparkfulltextquery_spark.dedup import simhash as SH
from sparkfulltextquery_spark.functions.hashes import (
    MINHASH_PRIME,
    h28_duck,
    h60_duck,
)
from sparkfulltextquery_spark.functions.text import normalize_text, normalize_text_duck, shingles_duck
from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table

_SHINGLES = shingles_duck("text", MH.SHINGLE_K)
_NORM = normalize_text_duck("text")

_PERMS_VALUES = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(MH.MINHASH_PERMS)
)

# Shared CTE prefix: distinct shingle sets + portable 28-bit shingle hash.
_SHINGLE_CTE = f"""
    toks AS (
      SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS token FROM documents
    ),
    hashed AS (
      SELECT doc_id, {h28_duck('token')} AS h FROM toks
    ),
    perms(perm, a, b) AS (VALUES {_PERMS_VALUES}),
    sigs AS (
      SELECT doc_id, perm, min((a * h + b) % {MINHASH_PRIME}) AS sig
      FROM hashed CROSS JOIN perms
      GROUP BY doc_id, perm
    )
"""


@query(
    "dedup_exact_groups",
    oracle=f"""
    WITH crawl AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0
    )
    SELECT md5({_NORM}) AS content_key,
           count(*)      AS n_dups,
           min(doc_id)   AS canonical_id
    FROM crawl
    GROUP BY 1
    HAVING count(*) > 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 over normalized text, groups with >1 member, on a
    corpus with a simulated partial recrawl (every 3rd doc re-ingested under
    a new id — the synthetic corpus itself has no exact dups). Single
    hash-shuffle; at 100 TB this is the cheapest dedup pass and runs first
    to shrink the corpus before MinHash."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    recrawl = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    crawl = d.union(recrawl)
    return (
        crawl.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("content_key"))
        .groupBy("content_key")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("canonical_id"))
        .filter(F.col("n_dups") > 1)
    )


@query(
    "dedup_exact_canonical",
    oracle=f"""
    WITH keyed AS (SELECT doc_id, md5({_NORM}) AS content_key FROM documents)
    SELECT count(*) AS n_docs, count(DISTINCT content_key) AS n_unique
    FROM keyed
    """,
)
def dedup_exact_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level dedup stats: total vs content-distinct docs."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("content_key"))
    return keyed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("content_key").alias("n_unique"),
    )


@query(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH {_SHINGLE_CTE}
    SELECT doc_id, perm, sig FROM sigs WHERE doc_id < 20
    """,
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature determinism check: (doc_id, perm, sig) for the first
    docs must be bit-identical across engines — pins the portable-hash +
    permutation arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    sigs = MH.minhash_signatures(MH.doc_shingle_sets(d))
    return sigs.filter(F.col("doc_id") < 20)


@query(
    "dedup_minhash_pairs",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    bands AS (
      SELECT doc_id, perm // {MH.ROWS_PER_BAND} AS band,
             md5(string_agg(CAST(sig AS varchar), ',' ORDER BY perm)) AS band_key
      FROM sigs GROUP BY doc_id, perm // {MH.ROWS_PER_BAND}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    -- r9: verification over the 60-bit portable-hash shingle sets, in
    -- lockstep with verified_near_dups (same md5-derived h60 on both
    -- engines, so even a hash collision perturbs both identically)
    htoks AS (SELECT DISTINCT doc_id, {h60_duck('token')} AS h FROM toks),
    sizes AS (SELECT doc_id, count(*) AS n FROM htoks GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_inter
      FROM cands c
      JOIN htoks ta ON ta.doc_id = c.doc_a
      JOIN htoks tb ON tb.doc_id = c.doc_b AND tb.h = ta.h
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           round(n_inter / (na.n + nb.n - n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE round(n_inter / (na.n + nb.n - n_inter), 6) >= 0.5
    """,
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: signatures → 8×2 banding →
    candidate join → exact-Jaccard verification ≥ 0.5."""
    d = load_table(spark, sf_dir, "documents")
    return MH.verified_near_dups(d, threshold=0.5)


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM (SELECT doc_id, unnest({_SHINGLES}) AS token FROM documents)
      GROUP BY doc_id, token
    ),
    hashed AS (SELECT doc_id, tf, {h28_duck('token')} AS h FROM tf),
    bits AS (SELECT doc_id, unnest(range({SH.N_BITS})) AS j, tf, h FROM hashed),
    votes AS (
      SELECT doc_id, j,
             sum(CASE WHEN ((h >> j) & 1) = 1 THEN tf ELSE -tf END) AS s
      FROM bits GROUP BY doc_id, j
    ),
    fps AS (
      SELECT doc_id,
             cast(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bigint) AS fp
      FROM votes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, fp, band,
             (fp >> (band * {SH.BITS_PER_BAND})) & {(1 << SH.BITS_PER_BAND) - 1} AS band_bits
      FROM (SELECT doc_id, fp, unnest(range({SH.N_BANDS})) AS band FROM fps)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.fp, b.fp)) AS hamming
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.band_bits = b.band_bits AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 3
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (28-bit weighted fingerprint over 3-shingles,
    4×7-bit band blocking, hamming ≤ 3 — blocking is exhaustive for d<4)."""
    d = load_table(spark, sf_dir, "documents")
    return SH.simhash_near_dups(d, max_hamming=3)


@query(
    "dedup_ngram_rare_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS s FROM documents
    ),
    rare AS (
      SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND 5
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN rare USING (s) JOIN sh b USING (s)
      WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_inter
      FROM cands c
      JOIN sh ta ON ta.doc_id = c.doc_a
      JOIN sh tb ON tb.doc_id = c.doc_b AND tb.s = ta.s
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           round(n_inter / (na.n + nb.n - n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE round(n_inter / (na.n + nb.n - n_inter), 6) >= 0.6
    """,
)
def dedup_ngram_rare_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard dedup with rare-shingle blocking: only shingles with
    document frequency in [2,5] generate candidate pairs (common shingles
    would explode the pair count; df=1 shingles can't pair). Exact Jaccard
    over full shingle sets, threshold 0.6."""
    d = load_table(spark, sf_dir, "documents")
    sh = MH.doc_shingle_sets(d).withColumnRenamed("token", "s")
    rare = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_s")).filter(
        (F.col("df_s") >= 2) & (F.col("df_s") <= 5)
    ).select("s")
    a = sh.join(rare, "s").select(F.col("s"), F.col("doc_id").alias("doc_a"))
    b = sh.select(F.col("s"), F.col("doc_id").alias("doc_b"))
    cands = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ta = sh.select(F.col("doc_id").alias("doc_a"), "s")
    tb = sh.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        cands.join(ta, "doc_a")
        .join(tb, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.6)
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    n AS (
      SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: all pairs with cosine ≥ 0.4. Brute-force n² is the
    verification baseline (fine ≤ ~10⁴ vectors / partition-local blocks); the
    scale path is similarity.lsh_bucketed_pairs (random-hyperplane blocking)."""
    from sparkfulltextquery_spark.similarity import dot_expr, norm_expr

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # norms once per VECTOR before the join (the oracle's `n` CTE), not per
    # pair after it: the per-pair expression is the dot product alone —
    # 2/3 of the pair-stage fold work hoisted out of the n² stage
    # (measured 29.7s -> 11.4s on the 2M-pair sf0.1 shape)
    en = e.select("vec_id", "v", norm_expr(F.col("v")).alias("nrm"))
    a = en.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = en.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot_expr(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.4)
    )


_FUZZY_ORACLE = """
    WITH names AS (SELECT DISTINCT p_name FROM part),
    toks AS (SELECT p_name, unnest(string_split(p_name, ' ')) AS tok FROM names),
    cand AS (
      SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.p_name < b.p_name)
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist
    FROM cand
    WHERE levenshtein(name_a, name_b) BETWEEN 1 AND 3
"""


@query("dedup_fuzzy_name_pairs", oracle=_FUZZY_ORACLE)
def dedup_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching as a *blocked* similarity join: candidate pairs
    share at least one token (explode → equi-join on the token), then the
    expensive edit-distance verification (reference Levenshtein,
    stringExpressions.scala:1083) runs only on candidates. The same
    candidate-generation-then-verify discipline as the MinHash/LSH dedup —
    never an all-pairs theta join.

    Recall caveat (documented, inherent to token blocking): pairs sharing no
    whole token are missed even if globally close (e.g. one-word names with
    a typo'd token) — at this vocabulary that tradeoff is empty.

    Scale: |distinct names| ≪ |parts|, so the distinct() collapses the fact
    table first; the token join is an equi-join (shuffle or broadcast by
    size), and verification is per-candidate codegen'd."""
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    toks = names.select(
        "p_name", F.explode(F.split("p_name", " ")).alias("tok")
    )
    a = toks.select(F.col("p_name").alias("name_a"), "tok")
    b = toks.select(F.col("p_name").alias("name_b"), "tok")
    cand = (
        a.join(b, "tok")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b")
    return cand.filter(dist.between(1, 3)).select(
        "name_a", "name_b", dist.cast("long").alias("edit_dist")
    )


_CC_ORACLE = """
    WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
    toks AS (SELECT p_name, unnest(string_split(p_name, ' ')) AS tok FROM names),
    pairs AS (
      SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.p_name < b.p_name),
    fuzzy AS (
      SELECT name_a, name_b FROM pairs
      WHERE levenshtein(name_a, name_b) BETWEEN 1 AND 3),
    edges AS (
      SELECT name_a AS src, name_b AS dst FROM fuzzy
      UNION ALL
      SELECT name_b AS src, name_a AS dst FROM fuzzy),
    reach(src, dst) AS (
      SELECT src, src FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    comp AS (SELECT src AS vertex, min(dst) AS component FROM reach GROUP BY src)
    SELECT vertex, component,
           count(*) OVER (PARTITION BY component) AS cluster_size
    FROM comp
"""


@query("dedup_connected_components", oracle=_CC_ORACLE)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → clusters: connected components over the fuzzy
    name-similarity graph (token-blocked levenshtein ≤ 3 pairs from
    dedup_fuzzy_name_pairs), labeling every matched name with its cluster's
    lexicographic-min name + the cluster size — the decision relation a
    dedup pipeline keeps one canonical row per component from.

    The oracle computes the same fixpoint as a recursive-CTE transitive
    closure (exact but O(V·E) — oracle-only); the engine side is the
    O(diameter)-round label propagation in dedup.components, which is the
    shape that survives 100 TB."""
    from sparkfulltextquery_spark.dedup.components import connected_components

    pairs = dedup_fuzzy_name_pairs(spark, sf_dir).select("name_a", "name_b")
    comp = connected_components(pairs, src="name_a", dst="name_b")
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "component").select("vertex", "component", "cluster_size")


# ---------------- incremental dedup vs persisted signature store ----------------

_SIG_STORE_CACHE: dict[tuple[str, str], str] = {}


def _ensure_sig_store(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session+sf_dir) the persisted MinHash signature store
    over the 'existing corpus' slice (doc_id % 10 != 7) of documents.

    Location is the DETERMINISTIC per-sf_dir root (storage.index_store_root,
    overwrite-replaced across sessions) — mkdtemp here used to leak one
    `sftq_sigstore_*` directory per Spark app (r9 hygiene fix; same
    ADVICE r03 discipline as the text index)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SIG_STORE_CACHE:
        from sparkfulltextquery_spark.dedup.incremental import build_signature_store
        from sparkfulltextquery_spark.storage import index_store_root

        path = index_store_root("sigstore", sf_dir)
        corpus = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 10 != 7
        )
        build_signature_store(corpus, f"file://{path}")
        _SIG_STORE_CACHE[key] = f"file://{path}"
    return _SIG_STORE_CACHE[key]


@query(
    "dedup_incremental_minhash",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    bands AS (
      SELECT doc_id, perm // {MH.ROWS_PER_BAND} AS band,
             md5(string_agg(CAST(sig AS varchar), ',' ORDER BY perm)) AS band_key
      FROM sigs GROUP BY doc_id, perm // {MH.ROWS_PER_BAND}
    ),
    cands AS (
      SELECT DISTINCT d.doc_id AS doc_new, e.doc_id AS doc_old
      FROM bands d JOIN bands e
        ON d.band = e.band AND d.band_key = e.band_key
      WHERE d.doc_id % 10 = 7 AND e.doc_id % 10 <> 7
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
    inter AS (
      SELECT c.doc_new, c.doc_old, count(*) AS n_inter
      FROM cands c
      JOIN toks tn ON tn.doc_id = c.doc_new
      JOIN toks te ON te.doc_id = c.doc_old AND te.token = tn.token
      GROUP BY c.doc_new, c.doc_old
    )
    SELECT i.doc_new, i.doc_old,
           round(n_inter / (nn.n + no.n - n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes nn ON nn.doc_id = i.doc_new
    JOIN sizes no ON no.doc_id = i.doc_old
    WHERE round(n_inter / (nn.n + no.n - n_inter), 6) >= 0.5
    """,
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup detection: the delta batch (doc_id % 10 = 7)
    probed against the persisted signature store of the existing corpus —
    the corpus is hashed once at store-build time, each ingest batch only
    shingles its own rows, probes band buckets, and verifies candidates
    (dedup/incremental.py). The oracle recomputes the identical algorithm
    from scratch; results match because signatures are deterministic."""
    from sparkfulltextquery_spark.dedup.incremental import incremental_near_dups

    store = _ensure_sig_store(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    delta = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    return incremental_near_dups(spark, delta, corpus, store, threshold=0.5)


_CANONICAL_ORACLE = """
    WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
    toks AS (SELECT p_name, unnest(string_split(p_name, ' ')) AS tok FROM names),
    pairs AS (
      SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.p_name < b.p_name),
    fuzzy AS (
      SELECT name_a, name_b FROM pairs
      WHERE levenshtein(name_a, name_b) BETWEEN 1 AND 3),
    edges AS (
      SELECT name_a AS src, name_b AS dst FROM fuzzy
      UNION ALL
      SELECT name_b AS src, name_a AS dst FROM fuzzy),
    reach(src, dst) AS (
      SELECT src, src FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    comp AS (SELECT src AS vertex, min(dst) AS component FROM reach GROUP BY src),
    members AS (
      SELECT comp.component, part.p_partkey, part.p_name, part.p_retailprice
      FROM comp JOIN part ON part.p_name = comp.vertex
    )
    SELECT component,
           p_partkey AS canonical_partkey,
           p_name AS canonical_name,
           round(p_retailprice, 2) AS canonical_price,
           count(*) OVER (PARTITION BY component) AS n_members
    FROM members
    QUALIFY row_number() OVER (
      PARTITION BY component ORDER BY p_retailprice DESC, p_partkey
    ) = 1
"""


@query("dedup_cluster_canonical", oracle=_CANONICAL_ORACLE)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END DECISION: near-dup clusters (connected components over
    the fuzzy-name graph) reduced to ONE canonical row each — highest
    retail price wins, part-key ascending breaks ties. The canonical pick
    is max(struct(price, -key)) — a partial-aggregable hash aggregate, not
    a per-cluster window sort (the member relation can be huge; the
    aggregate streams)."""
    from sparkfulltextquery_spark.dedup.components import connected_components

    pairs = dedup_fuzzy_name_pairs(spark, sf_dir).select("name_a", "name_b")
    comp = connected_components(pairs, src="name_a", dst="name_b")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice"
    )
    members = comp.join(p, comp.vertex == p.p_name)
    return (
        members.groupBy("component")
        .agg(
            F.max(
                F.struct(
                    F.col("p_retailprice").alias("price"),
                    (-F.col("p_partkey")).alias("negkey"),
                    F.col("p_partkey").alias("p_partkey"),
                    F.col("p_name").alias("p_name"),
                )
            ).alias("best"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "component",
            F.col("best.p_partkey").alias("canonical_partkey"),
            F.col("best.p_name").alias("canonical_name"),
            F.round(F.col("best.price"), 2).alias("canonical_price"),
            "n_members",
        )
    )


@query(
    "dedup_span_passages",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents),
    spans AS (
      SELECT doc_id, md5(array_to_string(tk[i*16+1 : i*16+16], ' ')) AS span_hash
      FROM toks, unnest(range(0, CAST(ceil(len(tk) / 16.0) AS BIGINT))) AS u(i)
      WHERE len(tk[i*16+1 : i*16+16]) = 16)
    SELECT span_hash,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM spans
    GROUP BY span_hash
    HAVING count(DISTINCT doc_id) >= 2
    """,
)
def dedup_span_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-granularity exact dedup (r5): every document is cut into
    TUMBLING 16-token spans; spans whose hash appears in >= 2 distinct
    documents are the cross-document duplicated passages — the
    paragraph/passage-dedup primitive web-scale pipelines (CCNet /
    RefinedWeb style) run BELOW document granularity, where doc-level
    minhash can't see shared boilerplate inside otherwise-distinct pages.

    Plan: tokenize map-side, explode ~n_tokens/16 span rows per doc, ONE
    md5 hash-shuffle with partial aggregation (count + count-distinct on
    the span key). At 100 TB this is the same single-shuffle shape as
    exact doc dedup, with ~16x the row count of the corpus's token/16
    stream — embarrassingly scalable; the HAVING prunes the long unique
    tail at the reducer."""
    d = load_table(spark, sf_dir, "documents")
    from sparkfulltextquery_spark.functions.text import tokenize

    toks = d.select("doc_id", tokenize(F.col("text")).alias("tk"))
    n_spans = F.ceil(F.size("tk") / F.lit(16.0)).cast("long")
    spans = (
        toks.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_spans - 1)).alias("i"),
            F.col("tk"),
        )
        .select(
            "doc_id", F.slice(F.col("tk"), F.col("i") * 16 + 1, 16).alias("span")
        )
        .filter(F.size("span") == 16)
        .select("doc_id", F.md5(F.concat_ws(" ", F.col("span"))).alias("span_hash"))
    )
    return (
        spans.groupBy("span_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


_SEMDEDUP_K_SQL = (
    "(SELECT GREATEST(8, CAST(floor(sqrt(count(*))) AS INT)) FROM embeddings)"
)


def _gram_prune_pdf(pdf, tau: float):
    """Per-cluster SemDeDup prune mask: ids whose cosine to ANY lower-id
    cluster-mate rounds to >= tau at 6dp. r13 (VERDICT r12 #3 / ADVICE):
    the Gram is TILED in fixed row blocks so peak memory is O(block·n_c)
    instead of the full n_c×n_c matrix — k=isqrt(n) bounds only the
    EXPECTED cluster size; a skewed giant cluster would otherwise
    materialize its whole square in one Python worker. Block rows sized
    so one tile stays ~32 MB of float64 (≥1 row); values and the pruned
    set are identical to the untiled form — same rounded cosines, the
    strict-upper-triangle mask just accumulates per row-block.
    Module-level so the skewed-cluster fixture test pins tiled == untiled
    directly."""
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    n_c = len(ids)
    if n_c < 2:
        return pd.DataFrame({"vec_id": ids[:0]})
    V = np.array(pdf["v"].tolist(), dtype=np.float64)
    nrm = np.sqrt((V * V).sum(axis=1))
    blk = max(1, (4 << 20) // n_c)
    mask = np.zeros(n_c, dtype=bool)
    for i0 in range(0, n_c, blk):
        i1 = min(i0 + blk, n_c)
        S = np.round((V[i0:i1] @ V.T) / np.outer(nrm[i0:i1], nrm), 6)
        # rows are ids i0..i1-1; a prunes b only when a < b (strict upper
        # triangle of the full matrix)
        hit = S >= tau
        cols = np.arange(n_c)
        hit &= cols[None, :] > (np.arange(i0, i1))[:, None]
        mask |= hit.any(axis=0)
    return pd.DataFrame({"vec_id": ids[mask]})


def _semdedup_oracle(iters: int = 2, tau: float = 0.4) -> str:
    """Oracle for dedup_semdedup_prune: the sim_kmeans_assign CTE chain
    (same deterministic init / 6dp argmin) nested as `asg` — with the
    cluster count k = max(8, isqrt(n)) expressed as a scalar-subquery
    LIMIT so both engines derive the same data-dependent k — then the
    within-cluster keep-first cosine prune mirrored in DuckDB list ops
    (list_inner_product matches the Spark zip_with left fold)."""
    from sparkfulltextquery_spark.similarity.queries import _kmeans_duck

    return f"""
    WITH asg AS ({_kmeans_duck(_SEMDEDUP_K_SQL, iters)}),
    ev AS (
      SELECT e.vec_id, asg.cluster, e.embedding::DOUBLE[] AS v
      FROM embeddings e JOIN asg USING (vec_id)
    ),
    n AS (
      SELECT vec_id, cluster, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM ev
    ),
    dup AS (
      SELECT DISTINCT b.vec_id
      FROM n a JOIN n b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE round(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= {tau}
    )
    SELECT vec_id, cluster FROM asg
    WHERE vec_id NOT IN (SELECT vec_id FROM dup)
    """


@query("dedup_semdedup_prune", oracle=_semdedup_oracle())
def dedup_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup =
    k-means cluster the embeddings, then prune within each cluster any
    vector whose cosine to a lower-id cluster-mate is >= tau (keep-first,
    the same deterministic canonical rule as exact dedup). Returns the
    surviving (vec_id, cluster).

    100 TB shape: clustering is the trained IVF coarse quantizer
    (broadcast centroids, O(k*dim) shuffle per round); the pairwise stage
    joins on cluster, so the quadratic work is n²/k per cluster instead
    of n² global — k grows with the corpus, keeping per-cluster blocks
    bounded, and each cluster's block is embarrassingly parallel (no
    global shuffle beyond the one cluster-key join). Reference analogue:
    mllib KMeans + a blocked self-join; no counterpart in the reference
    engine (pipeline upgrade)."""
    from sparkfulltextquery_spark.similarity import kmeans_iterate

    import math

    e = load_table(spark, sf_dir, "embeddings")
    # k grows with the corpus (k = max(8, isqrt(n)), the IVF coarse-
    # quantizer discipline): pair work is n^2/k, so sqrt scaling keeps the
    # whole operator O(n^1.5) instead of quadratic-with-a-constant. The
    # count is one scalar to the driver; the oracle derives the same k via
    # a scalar-subquery LIMIT.
    k = max(8, math.isqrt(e.count()))
    # materialize the assignment once: it feeds three plan branches (the
    # pair-stage input and the final anti-join) and would otherwise replay
    # the final Lloyd assignment per branch
    assigned = kmeans_iterate(e, k=k, iters=2).localCheckpoint(eager=False)
    # Pair stage (r12 second pass): per-cluster NumPy Gram matrix via
    # applyInPandas instead of the cluster-key self-join + per-pair fold
    # dot. The self-join shipped every vector TWICE through the cluster
    # exchange and evaluated an interpreted (CodegenFallback) fold per
    # surviving pair — n²/k interpreted dim-length dots; the grouped form
    # ships each vector ONCE and hands the n_c×n_c block to BLAS
    # (guide §4.2: let Spark do the shuffle, vectorized native code do the
    # flops). Measured at sf1 (n=20k, k=141): pair stage 1.58 → 0.41s,
    # whole query 12.6 → ~2s with the NumPy assignment; identical rows.
    # Cosine semantics unchanged: round(dot/(na·nb), 6) >= tau with norms
    # from the same vectors — NumPy's pairwise summation differs from the
    # fold only in the last ulp, absorbed by the 6dp round exactly as the
    # DuckDB-vs-Spark order difference always was (oracle re-proven at
    # sf0.001/0.01 + row-identity vs the join form at sf0.1/sf1).
    # Skew note (100 TB): one giant cluster = one task computing its Gram
    # block — but k = isqrt(n) keeps expected block size ~sqrt(n), and the
    # former join shape was quadratically WORSE on the same hot cluster
    # (n_c² joined rows through one partition vs n_c rows + BLAS flops).
    tau = 0.4

    def _gram_prune(pdf):
        return _gram_prune_pdf(pdf, tau)

    ev = (
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .join(assigned, "vec_id")
        .select("vec_id", "cluster", "v")
    )
    # clusters partition the ids, and the mask is per-id within a cluster —
    # dup rows are unique by construction (the old join form needed a
    # distinct over the surviving pair list)
    dup = ev.groupBy("cluster").applyInPandas(_gram_prune, "vec_id bigint")
    return assigned.join(dup, "vec_id", "left_anti").select("vec_id", "cluster")
