"""Registered similarity-search queries + DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table

EMB_DIM = 64  # synthetic corpus embedding dimension (checked in tests)

_E_CTE = """
    e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
"""

_COS = (
    "list_inner_product({a}, {b}) / "
    "(sqrt(list_sum(list_transform({a}, x -> x * x))) * "
    "sqrt(list_sum(list_transform({b}, x -> x * x))))"
)


@query(
    "sim_cosine_topk",
    oracle=f"""
    WITH {_E_CTE},
    scored AS (
      SELECT vec_id, round({_COS.format(a='v', b='qv')}, 6) AS cosine
      FROM e CROSS JOIN q
    )
    SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the vec_id=0 embedding — the exact
    ANN baseline. Query vector is a 1-row bounded collect (the only
    driver-side value in the pipeline), then a literal broadcast."""
    from sparkfulltextquery_spark.similarity import cosine_topk

    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return cosine_topk(e, [float(x) for x in qvec], k=10)


@query(
    "sim_ivf_topk",
    oracle=f"""
    WITH {_E_CTE},
    dims AS (
      SELECT label, unnest(range(1, len(v) + 1)) AS dim, unnest(v) AS x FROM e
    ),
    cents AS (
      SELECT label, list(m ORDER BY dim) AS c
      FROM (SELECT label, dim, avg(x) AS m FROM dims GROUP BY label, dim)
      GROUP BY label
    ),
    probes AS (
      SELECT label FROM cents CROSS JOIN q
      ORDER BY {_COS.format(a='c', b='qv')} DESC, label LIMIT 3
    )
    SELECT vec_id, round({_COS.format(a='v', b='qv')}, 6) AS cosine
    FROM e JOIN probes USING (label) CROSS JOIN q
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe the 3 clusters whose centroids are nearest the
    query, brute-force only those. At scale = partition pruning on the
    cluster column; centroids computed shuffle-parallel (posexplode+groupBy)."""
    from sparkfulltextquery_spark.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return ivf_topk(e, [float(x) for x in qvec], k=10, n_probe=3)


def _lsh_buckets_oracle() -> str:
    from sparkfulltextquery_spark.similarity import hyperplane_bucket_duck

    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT {hyperplane_bucket_duck('v', EMB_DIM)} AS bucket, count(*) AS n
    FROM e GROUP BY 1
    """


@query("sim_lsh_buckets", oracle=_lsh_buckets_oracle())
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing: 12-bit sign key per vector; returns
    bucket occupancy (bucket, n). The n²-free blocking primitive for
    embedding near-dup at scale."""
    from sparkfulltextquery_spark.similarity import hyperplane_bucket

    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(
            hyperplane_bucket(
                F.col("embedding").cast("array<double>"), EMB_DIM
            ).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _lsh_pairs_oracle() -> str:
    from sparkfulltextquery_spark.similarity import hyperplane_band_keys_duck

    bands = hyperplane_band_keys_duck("v", EMB_DIM)
    cos = _COS.format(a="a.v", b="b.v")
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, {bands} AS bands FROM embeddings
    ),
    keyed AS (SELECT vec_id, v, unnest(bands) AS band_key FROM e)
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({cos}, 6) AS cosine
    FROM keyed a JOIN keyed b ON a.band_key = b.band_key AND a.vec_id < b.vec_id
    WHERE round({cos}, 6) >= 0.2
    """


@query("sim_lsh_near_dup_pairs", oracle=_lsh_pairs_oracle())
def sim_lsh_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded hyperplane LSH near-dup: 24 planes in 4 bands of 6; pairs
    sharing ANY band are candidates (n²-free), verified by exact cosine
    ≥ 0.2. Banding fixes the recall cliff of a single monolithic bucket
    (~0% below cosine 0.7 → 1−(1−p⁶)⁴). The brute-force query
    dedup_embedding_cosine is the exactness baseline."""
    from sparkfulltextquery_spark.similarity import (
        dot_expr,
        hyperplane_band_keys,
        norm_expr,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    # norm once per vector, before banding replicates rows ×4 and the
    # band join pairs them — per-candidate work is the dot product alone
    keyed = e.select(
        "vec_id",
        "v",
        norm_expr(F.col("v")).alias("nrm"),
        F.explode(hyperplane_band_keys(F.col("v"), EMB_DIM)).alias("band_key"),
    )
    a = keyed.select(
        F.col("band_key"), F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = keyed.select(
        F.col("band_key"), F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, "band_key")
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
        .distinct()
        .filter(F.col("cosine") >= 0.2)
    )


@query(
    "word2vec_synonyms",
    oracle="""
    SELECT CAST(5 AS BIGINT) AS n_synonyms,
           true AS excludes_query_word,
           true AS sims_in_unit_range
    FROM (SELECT 1)
    """,
)
def word2vec_synonyms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word2Vec end-to-end (reference Word2Vec.scala:121 fit, :205
    findSynonyms): train skip-gram embeddings on the tokenized corpus, land
    vectors as a (word, array<float>) table, rank synonyms of 'spark' by
    the engine's own cosine top-k. Multithreaded SGD weight averaging is
    nondeterministic across runs even with a fixed seed, so the
    driver-checked output is the API contract: exactly k results, the query
    word excluded, all cosines in [-1, 1]. Ranking QUALITY (planted
    synonyms recovered) is pinned separately in tests/test_word2vec.py."""
    from sparkfulltextquery_spark.similarity.word2vec import (
        find_synonyms,
        train_word2vec,
    )

    d = load_table(spark, sf_dir, "documents")
    vectors = train_word2vec(d, vector_size=32, min_count=2, max_iter=1, seed=42)
    syn = find_synonyms(vectors, "spark", k=5)
    return syn.agg(
        F.count(F.lit(1)).alias("n_synonyms"),
        F.bool_and(F.col("word") != "spark").alias("excludes_query_word"),
        F.bool_and(
            (F.col("similarity") >= -1.000001) & (F.col("similarity") <= 1.000001)
        ).alias("sims_in_unit_range"),
    )


@query(
    "sim_normalize_lp",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id < 100),
    n AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS l2,
             list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS vn
      FROM e
    )
    SELECT vec_id,
           round(l2, 6)                                              AS l2_orig,
           round(sqrt(list_sum(list_transform(vn, x -> x * x))), 6)  AS l2_normed,
           round(list_sum(list_transform(vn, x -> abs(x))), 6)       AS l1_normed
    FROM n
    """,
)
def sim_normalize_lp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalizer (reference Normalizer.scala:35): L2-normalize the
    embedding column, verify unit norm + report the L1 mass of the
    normalized vector — flat scalar outputs (canonicalizer-safe)."""
    from sparkfulltextquery_spark.similarity import lp_norm_expr, normalize_expr

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    v = F.col("embedding").cast("array<double>")
    # Alias both vectors to plain identifiers so lp_norm_expr's string
    # path fires and the norms unroll into whole-stage codegen (Column
    # operands would silently fall back to the HOF fold — the unrolled
    # text is pinned bit-identical to the fold in tests/test_vector_exprs).
    staged = e.select(
        "vec_id", v.alias("v"), normalize_expr(v, 2.0).alias("vn")
    )
    return staged.select(
        "vec_id",
        F.round(lp_norm_expr("v", 2.0, EMB_DIM), 6).alias("l2_orig"),
        F.round(lp_norm_expr("vn", 2.0, EMB_DIM), 6).alias("l2_normed"),
        F.round(lp_norm_expr("vn", 1.0, EMB_DIM), 6).alias("l1_normed"),
    )


@query(
    "sim_int8_quantization",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id < 200),
    s AS (
      SELECT vec_id, v,
             127.0 / list_max(list_transform(v, x -> abs(x))) AS scale
      FROM e
    ),
    q AS (
      SELECT vec_id, scale,
             list_transform(v, x -> round(x * scale)) AS qv
      FROM s
    )
    SELECT vec_id,
           round(scale, 6)                                   AS scale,
           list_sum(qv)::BIGINT                              AS q_checksum,
           list_max(list_transform(qv, x -> abs(x)))::BIGINT AS q_max_abs
    FROM q
    """,
)
def sim_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (the storage/bandwidth step of
    a large-scale vector pipeline: 4× smaller vectors before ANN serving):
    per-vector scale = 127/max|x|, elementwise round. Flat scalar outputs
    (scale + checksums) keep the canonicalizer happy; dequantization is the
    same expression inverted.

    Scale: shuffle-free per-row array math, all codegen'd — at 100 TB this
    is a map-only rewrite of the embedding column."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    v = F.col("embedding").cast("array<double>")
    scale = F.lit(127.0) / F.array_max(F.transform(v, lambda x: F.abs(x)))
    qv = F.transform(F.col("v"), lambda x: F.round(x * F.col("scale")))
    return (
        e.select("vec_id", v.alias("v"), scale.alias("scale"))
        .select("vec_id", "scale", qv.alias("qv"))
        .select(
            "vec_id",
            F.round("scale", 6).alias("scale"),
            F.aggregate("qv", F.lit(0.0), lambda a, x: a + x)
            .cast("long")
            .alias("q_checksum"),
            F.array_max(F.transform("qv", lambda x: F.abs(x)))
            .cast("long")
            .alias("q_max_abs"),
        )
    )


_ANN_INDEX_CACHE: dict = {}


def _ensure_ann_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session+sf_dir) the persisted IVF index under the
    deterministic per-sf_dir root (storage.index_store_root; overwrite-
    replaces across sessions, no mkdtemp leak) — mirrors
    functions.fulltext_queries._ensure_index."""
    from sparkfulltextquery_spark.storage import index_store_root

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ANN_INDEX_CACHE:
        from sparkfulltextquery_spark.similarity import build_ann_index

        out = index_store_root("ann", sf_dir)
        e = load_table(spark, sf_dir, "embeddings")
        _ANN_INDEX_CACHE[key] = build_ann_index(e, f"file://{out}")
    return _ANN_INDEX_CACHE[key]


_PQ_INDEX_CACHE: dict = {}


def ensure_pq_index(spark: SparkSession, sf_dir: str):
    """Train once per session+sf_dir: collect the codebook literals (ONE
    centroid job) and persist the PQ code table partitioned by coarse label
    (m ints/vector — the IVF-PQ storage layout). Registered PQ queries
    consume this instead of re-training per call: a query is then pure
    plan construction + one pruned code scan + the C-row re-rank.

    Code table lives under the deterministic per-sf_dir root
    (storage.index_store_root): the overwrite-mode write replaces any
    prior generation, so sessions don't leak directories and a restart
    refreshes codes from current embeddings (ADVICE r03)."""
    from sparkfulltextquery_spark.similarity import pq_encode, pq_train
    from sparkfulltextquery_spark.storage import index_store_root

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PQ_INDEX_CACHE:
        e = load_table(spark, sf_dir, "embeddings")
        # m pinned: the registered DuckDB oracles replay THIS codebook
        # (8-dim subspace slices, shortlist 30) — full-auto (r11) would
        # retune m/codes/shortlist with corpus size out from under them
        lit = pq_train(e, m=8)
        out = index_store_root("pq", sf_dir)
        path = f"file://{out}/codes"
        pq_encode(e, literals=lit).write.mode("overwrite").partitionBy(
            "label"
        ).parquet(path)
        _PQ_INDEX_CACHE[key] = (lit, path)
    return _PQ_INDEX_CACHE[key]


@query(
    "sim_ivf_topk_indexed",
    oracle=f"""
    WITH {_E_CTE},
    dims AS (
      SELECT label, unnest(range(1, len(v) + 1)) AS dim, unnest(v) AS x FROM e
    ),
    cents AS (
      SELECT label, list(m ORDER BY dim) AS c
      FROM (SELECT label, dim, avg(x) AS m FROM dims GROUP BY label, dim)
      GROUP BY label
    ),
    probes AS (
      SELECT label FROM cents CROSS JOIN q
      ORDER BY {_COS.format(a='c', b='qv')} DESC, label LIMIT 3
    )
    SELECT vec_id, round({_COS.format(a='v', b='qv')}, 6) AS cosine
    FROM e JOIN probes USING (label) CROSS JOIN q
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def sim_ivf_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search from the PERSISTED index: vectors stored partitioned by
    cluster id, centroids precomputed — a probe reads only n_probe
    partition directories (PartitionFilters, asserted in
    tests/test_index.py). Same results as sim_ivf_topk without recomputing
    centroids per query; the ANN analogue of the bucketed text index."""
    from sparkfulltextquery_spark.similarity import ann_search_indexed

    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    idx = _ensure_ann_index(spark, sf_dir)
    return ann_search_indexed(spark, idx, [float(x) for x in qvec], k=10, n_probe=3)


@query(
    "fulltext_query_expansion",
    oracle="""
    SELECT CAST(10 AS BIGINT) AS n_results,
           true AS scores_positive,
           true AS docs_unique
    FROM (SELECT 1)
    """,
)
def fulltext_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synonym-expanded retrieval: the query term is widened with its
    Word2Vec nearest neighbors (embedding-trained on the same corpus), then
    BM25-ranked as an OR query — the search+ML composition the reference's
    two halves (full-text scoring, ml.feature.Word2Vec) exist to enable.
    The expansion terms depend on nondeterministic SGD training, so the
    driver-checked output is the retrieval contract: a full top-10 ('query'
    alone matches far more than 10 docs at every SF, so expansion can only
    keep the list full), strictly positive BM25 scores, distinct doc ids.

    Scale: expansion terms are a bounded driver-side list (k nearest words
    — same discipline as IVF probe labels); the search itself is the
    engine's standard posting-semi-join + BM25 top-k plan."""
    from sparkfulltextquery_spark.functions.fulltext import bm25_search
    from sparkfulltextquery_spark.similarity.word2vec import (
        find_synonyms,
        train_word2vec,
    )

    d = load_table(spark, sf_dir, "documents")
    vectors = train_word2vec(d, vector_size=16, min_count=5, max_iter=1, seed=42)
    expansions = [r.word for r in find_synonyms(vectors, "query", k=3).collect()]
    expanded = " ".join(["query"] + expansions)
    hits = bm25_search(d, expanded, k=10)
    return hits.agg(
        F.count(F.lit(1)).alias("n_results"),
        F.bool_and(F.col("score") > 0).alias("scores_positive"),
        (F.countDistinct("doc_id") == F.count(F.lit(1))).alias("docs_unique"),
    )


@query(
    "sim_pq_adc_topk",
    oracle=f"""
    WITH {_E_CTE},
    en AS (
      SELECT vec_id, label,
             list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS v
      FROM e
    ),
    qn AS (
      SELECT list_transform(qv, x -> x / sqrt(list_inner_product(qv, qv))) AS qv
      FROM q
    ),
    dims AS (
      SELECT label, unnest(range(1, len(v) + 1)) AS dim, unnest(v) AS x FROM en
    ),
    cmean AS (SELECT label, dim, avg(x) AS mdim FROM dims GROUP BY label, dim),
    cb AS (
      SELECT label, (dim - 1) // 8 AS s, list(mdim ORDER BY dim) AS csub
      FROM cmean GROUP BY label, (dim - 1) // 8
    ),
    esub AS (
      SELECT vec_id, s, list_slice(v, s * 8 + 1, s * 8 + 8) AS vsub
      FROM en CROSS JOIN range(8) t(s)
    ),
    codes AS (
      SELECT vec_id, s, label
      FROM (
        SELECT esub.vec_id, esub.s, cb.label,
               round(list_sum(list_transform(range(1, 9),
                     i -> (esub.vsub[i] - cb.csub[i]) * (esub.vsub[i] - cb.csub[i]))),
                     6) AS d2
        FROM esub JOIN cb USING (s)
      )
      QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, label) = 1
    ),
    lut AS (
      SELECT s, label,
             round(list_inner_product(list_slice(qv, s * 8 + 1, s * 8 + 8), csub), 6)
               AS partial
      FROM cb CROSS JOIN qn
    ),
    adc AS (
      SELECT vec_id, round(sum(partial), 6) AS adc
      FROM codes JOIN lut USING (s, label)
      GROUP BY vec_id
    ),
    short AS (SELECT vec_id FROM adc ORDER BY adc DESC, vec_id LIMIT 30)
    SELECT vec_id, round(list_inner_product(en.v, qn.qv), 6) AS cosine
    FROM en JOIN short USING (vec_id) CROSS JOIN qn
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: L2-normalized vectors compressed to 8
    subspace codes (codebook = label-centroid slices), ADC-scored off a
    broadcast LUT into a 30-candidate shortlist, exact-cosine re-ranked —
    the memory-side scale path (m bytes per vector instead of 4·dim) that
    composes with IVF into IVF-PQ. Exact-oracle checkable because the
    codebook is deterministic. Consumes the PERSISTED code table (built
    once per session by ensure_pq_index): the query itself runs zero
    training jobs — the shortlist scans m ints/row, raw vectors are read
    only for the 30-row re-rank."""
    from sparkfulltextquery_spark.similarity import pq_adc_topk_from_codes

    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    lit, codes_path = ensure_pq_index(spark, sf_dir)
    codes = spark.read.parquet(codes_path)
    return pq_adc_topk_from_codes(
        codes, e, [float(x) for x in qvec], k=10, literals=lit
    )


def _kmeans_duck(k: int | str = 8, iters: int = 2) -> str:
    """Unrolled Lloyd-iteration oracle mirroring similarity.kmeans_iterate:
    same deterministic init (the k lowest-vec_id vectors via ORDER BY +
    LIMIT, clusters labeled by seed vec_id), same 6dp-rounded squared-L2
    argmin with cluster-asc tie-break — d2 as the index-order sum of
    squared differences, the same IEEE addition sequence as the Spark
    zip_with fold — same per-dim mean update."""
    sql = f"""
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (SELECT vec_id::INT AS cluster, v AS c FROM e ORDER BY vec_id LIMIT {k})"""
    prev = "c0"
    for i in range(1, iters + 1):
        sql += f""",
    a{i} AS (
      SELECT vec_id, cluster FROM (
        SELECT e.vec_id, {prev}.cluster,
               round(list_sum(list_transform(range(1, len(e.v) + 1),
                     i -> (e.v[i] - {prev}.c[i]) * (e.v[i] - {prev}.c[i]))), 6) AS d2
        FROM e CROSS JOIN {prev}
      ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1
    )"""
        if i < iters:
            sql += f""",
    m{i} AS (
      SELECT cluster, unnest(range(1, len(v) + 1)) AS dim, unnest(v) AS x
      FROM e JOIN a{i} USING (vec_id)
    ),
    c{i} AS (
      SELECT cluster, list(m ORDER BY dim) AS c
      FROM (SELECT cluster, dim, avg(x) AS m FROM m{i} GROUP BY cluster, dim)
      GROUP BY cluster
    )"""
            prev = f"c{i}"
    return (
        "WITH" + sql + f"\n    SELECT vec_id, cluster FROM a{iters}"
    )


@query("sim_kmeans_assign", oracle=_kmeans_duck(k=8, iters=2))
def sim_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means training as DataFrame ops (reference analogue
    ml.clustering.KMeans) — 2 Lloyd rounds over the embedding table with
    deterministic init, final (vec_id, cluster) assignments. The trained
    form of the IVF coarse quantizer: at scale the output is written
    partitioned by cluster and sim_ivf_topk probes it."""
    from sparkfulltextquery_spark.similarity import kmeans_iterate

    e = load_table(spark, sf_dir, "embeddings")
    return kmeans_iterate(e, k=8, iters=2)


@query(
    "sim_ivfpq_topk",
    oracle=f"""
    WITH {_E_CTE},
    en AS (
      SELECT vec_id, label,
             list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS v
      FROM e
    ),
    qn AS (
      SELECT list_transform(qv, x -> x / sqrt(list_inner_product(qv, qv))) AS qv
      FROM q
    ),
    dims AS (
      SELECT label, unnest(range(1, len(v) + 1)) AS dim, unnest(v) AS x FROM en
    ),
    cmean AS (SELECT label, dim, avg(x) AS mdim FROM dims GROUP BY label, dim),
    cfull AS (
      SELECT label, list(mdim ORDER BY dim) AS c FROM cmean GROUP BY label
    ),
    probes AS (
      SELECT label FROM cfull CROSS JOIN qn
      ORDER BY round(list_inner_product(c, qv), 6) DESC, label LIMIT 2
    ),
    cb AS (
      SELECT label, (dim - 1) // 8 AS s, list(mdim ORDER BY dim) AS csub
      FROM cmean GROUP BY label, (dim - 1) // 8
    ),
    esub AS (
      SELECT vec_id, s, list_slice(v, s * 8 + 1, s * 8 + 8) AS vsub
      FROM (SELECT en.* FROM en JOIN probes USING (label))
      CROSS JOIN range(8) t(s)
    ),
    codes AS (
      SELECT vec_id, s, label
      FROM (
        SELECT esub.vec_id, esub.s, cb.label,
               round(list_sum(list_transform(range(1, 9),
                     i -> (esub.vsub[i] - cb.csub[i]) * (esub.vsub[i] - cb.csub[i]))),
                     6) AS d2
        FROM esub JOIN cb USING (s)
      )
      QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, label) = 1
    ),
    lut AS (
      SELECT s, label,
             round(list_inner_product(list_slice(qv, s * 8 + 1, s * 8 + 8), csub), 6)
               AS partial
      FROM cb CROSS JOIN qn
    ),
    adc AS (
      SELECT vec_id, round(sum(partial), 6) AS adc
      FROM codes JOIN lut USING (s, label)
      GROUP BY vec_id
    ),
    short AS (SELECT vec_id FROM adc ORDER BY adc DESC, vec_id LIMIT 30)
    SELECT vec_id, round(list_inner_product(en.v, qn.qv), 6) AS cosine
    FROM en JOIN short USING (vec_id) CROSS JOIN qn
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ capstone: coarse probe (2 clusters, ranked driver-side from
    the collected centroid literals — zero Spark jobs) → PQ-ADC shortlist
    over the PROBED PARTITIONS of the persisted code table (directory-level
    partition pruning) → exact re-rank of 30 raw vectors. The query reads
    n_probe/L of the codes and C raw vectors; nothing is retrained."""
    from sparkfulltextquery_spark.similarity import ivfpq_topk

    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    lit, codes_path = ensure_pq_index(spark, sf_dir)
    codes = spark.read.parquet(codes_path)
    return ivfpq_topk(
        e, [float(x) for x in qvec], k=10, n_probe=2, literals=lit, codes=codes
    )


@query(
    "sim_radius_search",
    oracle=f"""
    WITH {_E_CTE}
    SELECT vec_id, round({_COS.format(a='v', b='qv')}, 6) AS cosine
    FROM e CROSS JOIN q
    WHERE {_COS.format(a='v', b='qv')} >= 0.25 AND vec_id <> 0
    """,
)
def sim_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) search: ALL vectors within cosine >= tau of the query
    — the range-query dual of top-k, the primitive dedup thresholding uses
    (r5; complements sim_cosine_topk). Same literal-broadcast query vector
    and embarrassingly-parallel scan; the result is filter-bounded instead
    of heap-bounded, so no orderBy/limit appears in the plan at all — at
    100 TB the scan cost is identical to top-k, with output proportional
    to the true neighborhood size."""
    from sparkfulltextquery_spark.similarity import cosine_expr

    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    cos = cosine_expr(F.col("embedding").cast("array<double>"), q)
    return (
        e.select(F.col("vec_id"), cos.alias("_c"))
        .filter((F.col("_c") >= 0.25) & (F.col("vec_id") != 0))
        .select("vec_id", F.round("_c", 6).alias("cosine"))
    )


def _pq_train_duck(m: int = 4, L: int = 8, iters: int = 2) -> str:
    """Unrolled per-subspace k-means PQ trainer oracle mirroring
    similarity.pq_train(codes=L) + pq_encode: same L2-normalization, the
    same deterministic init (each subspace's L distinct subvectors with
    the lowest first-occurrence vec_id), the same 6dp-rounded squared-L2
    argmin with lowest-code tie-break per Lloyd round (d2 as the
    index-order sum — the IEEE sequence the unrolled Spark expression
    evaluates), the same per-(subspace, code, dim) mean update, the same
    survivorship rule (codes kept only if present in every subspace,
    re-labeled by sorted position), and the final encode. The float-sum
    order inside avg() is the only engine-divergence exposure — absorbed
    by the 6dp d2 rounding, the same accepted exposure as _kmeans_duck."""
    sub = EMB_DIM // m

    def d2(vt, ct):
        return (
            "round(("
            + " + ".join(
                f"({vt}[{i}] - {ct}[{i}]) * ({vt}[{i}] - {ct}[{i}])"
                for i in range(1, sub + 1)
            )
            + "), 6)"
        )

    sql = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    en AS (
      SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS v
      FROM e
    ),
    sv AS (
      SELECT vec_id, s, list_slice(v, s * {sub} + 1, s * {sub} + {sub}) AS sv
      FROM en CROSS JOIN range({m}) t(s)
    ),
    f0 AS (SELECT s, sv, min(vec_id) AS first_id FROM sv GROUP BY s, sv),
    c0 AS (
      SELECT s, code, sv AS c FROM (
        SELECT s, sv, row_number() OVER (PARTITION BY s ORDER BY first_id) AS code
        FROM f0
      ) WHERE code <= {L}
    )"""
    prev = "c0"
    for i in range(1, iters + 1):
        sql += f""",
    a{i} AS (
      SELECT vec_id, s, sv, code FROM (
        SELECT sv.vec_id, sv.s, sv.sv, {prev}.code,
               {d2('sv.sv', f'{prev}.c')} AS d2
        FROM sv JOIN {prev} USING (s)
      ) QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code) = 1
    ),
    c{i} AS (
      SELECT s, code, list(mx ORDER BY dim) AS c FROM (
        SELECT s, code, dim, avg(x) AS mx FROM (
          SELECT s, code, unnest(range(1, {sub} + 1)) AS dim, unnest(sv) AS x
          FROM a{i}
        ) GROUP BY s, code, dim
      ) GROUP BY s, code
    )"""
        prev = f"c{i}"
    sql += f""",
    keep AS (SELECT code FROM {prev} GROUP BY code HAVING count(*) = {m}),
    lab AS (SELECT code, row_number() OVER (ORDER BY code) AS pos FROM keep),
    cb AS (
      SELECT {prev}.s, {prev}.code, lab.pos, {prev}.c
      FROM {prev} JOIN lab USING (code)
    )
    SELECT vec_id, s, code FROM (
      SELECT vec_id, s, pos AS code FROM (
        SELECT sv.vec_id, sv.s, cb.pos, {d2('sv.sv', 'cb.c')} AS d2
        FROM sv JOIN cb USING (s)
      ) QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, pos) = 1
    )
    """
    return sql


@query("sim_pq_train_codebook", oracle=_pq_train_duck())
def sim_pq_train_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained PQ codebook end-to-end (r10, VERDICT r09 #1): pq_train
    with a per-subspace k-means codebook (here m=4 subspaces x 8 codes,
    2 Lloyd rounds — small enough to mirror exactly in the DuckDB
    oracle; production uses codes=256/m=16, same machinery) and the
    resulting code assignment for every vector, exploded to flat
    (vec_id, s, code) rows. Scale shape: training is iters x (one scan +
    O(m*L*sub) update shuffle); encode is one scan with broadcast
    codewords; the oracle replays the identical Lloyd rounds in SQL
    (_pq_train_duck). Reference analogue: mllib KMeans
    (mllib/.../ml/clustering/KMeans.scala) as the subspace trainer."""
    from sparkfulltextquery_spark.similarity import pq_encode, pq_train

    e = load_table(spark, sf_dir, "embeddings")
    lit = pq_train(e, m=4, codes=8, train_iters=2)
    enc = pq_encode(e, m=4, literals=lit)
    # stack, NOT posexplode (r13): the codes array is a large derived
    # expression (m·L unrolled code argmins), and on a session without
    # this engine's InferFiltersFromGenerate exclusion the rule copies
    # that whole expression into an inferred size()/isnotnull() filter
    # below the Generate — the optimizer's substitution blow-up OOMs a
    # default-heap driver. stack emits the identical (s, code) rows
    # (positions 0..m-1 in order) from plain element_at projections the
    # rule never touches.
    m = lit["m"]
    pairs = ", ".join(f"{s}, element_at(codes, {s + 1})" for s in range(m))
    return enc.selectExpr("vec_id", f"stack({m}, {pairs}) as (s, code)")
