"""ANN index lifecycle (r11, VERDICT r10 #3): streaming vector ingest →
live reads → offline compaction with centroid RETRAIN → atomic
generation swap. The vector-side twin of the posting lifecycle in
functions/index_stream.py, sharing its generation-pointer protocol
(publish_generation / current_generation / gc_generations) — plus the
one property postings don't have: retrieval QUALITY depends on
coarse-structure freshness. Between compactions a live search probes
with the centroids trained at the LAST compaction (the Lucene
"new segments, old analyzer" analogue); compaction retrains centroids
from the full live corpus and restores label-partition pruning. The
recall story is measured in SCALE.md r11 and pinned in
tests/test_index.py::test_ann_index_lifecycle_recall_and_swap
(live-view recall under stale centroids; compacted == fresh-rebuild
search parity; read-view grace across the swap).

Layout under ``root``:
  segments/            the append-only vector log (segment = batch id;
                       the initial corpus seeds it at segment = -1)
  gen-N/               generations: build_ann_index output (vectors
                       partitioned by label + centroids) + _hwm parquet
                       recording the highest segment id folded in
  CURRENT              the generation pointer (index_stream protocol)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.functions.index_stream import (
    current_generation,
    publish_generation,
)
from sparkfulltextquery_spark.similarity import (
    build_ann_index,
    cosine_expr,
)


def _seg_dir(root: str) -> str:
    return f"{root}/segments"


def init_ann_index(
    spark: SparkSession,
    embeddings: DataFrame,
    root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> str:
    """Seed the lifecycle: the initial corpus becomes segment -1 of the
    vector log, gen-1 is built from it (partitioned vectors + centroids,
    hwm = -1), and the pointer publishes gen-1. Returns the generation
    directory.

    Segments are ``segment=<id>`` partition DIRECTORIES (r12, ADVICE
    r11): the seed overwrite wipes any previous log, and each streamed
    batch later overwrites only its own directory — truly idempotent
    under foreachBatch's at-least-once replay (a retried batch replaces
    its partial output instead of appending duplicate vec_id rows)."""
    (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            F.col(label_col).alias("label"),
        )
        .withColumn("segment", F.lit(-1).cast("long"))
        .write.mode("overwrite")
        .partitionBy("segment")
        .parquet(_seg_dir(root))
    )
    return compact_ann_index(spark, root, publish=True)


def stream_append_vectors(
    vec_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str | None = None,
):
    """Keep the vector log fresh as embeddings stream in: each
    micro-batch lands as its own ``segment=<batch_id>`` partition
    directory written with mode('overwrite') — log-structured, O(batch)
    ingest, and exactly-once under replay because foreachBatch is
    AT-LEAST-ONCE: a batch retried after a partial failure OVERWRITES
    its own directory instead of re-appending rows (r12, ADVICE r11 —
    the pre-r12 plain append would have left duplicate vec_id rows that
    neither read_live_vectors nor ann_search_live dedupes).

    Coarse assignment at ingest (the IVF "add" semantics): by default
    each arriving vector is assigned to the NEAREST centroid of the
    CURRENT generation — one broadcast(k centroids) × batch job, the
    kmeans_assign contract (6dp/lowest-cluster tie-break) — so it is
    immediately probe-able via ann_search_live even when its true
    neighborhood is one the index has never seen (a foreign label would
    be invisible to probing until compaction). The pointer is re-resolved
    PER BATCH, so a compaction mid-stream upgrades assignment of later
    batches to the retrained centroids. Pass ``label_col`` to trust
    upstream coarse labels instead (the given-label embeddings schema)."""
    from sparkfulltextquery_spark.similarity import kmeans_assign

    def update(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ev = batch_df.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            *([F.col(label_col).alias("label")] if label_col else []),
        )
        if label_col is None:
            gen = current_generation(root, spark=spark)
            if gen is None:
                raise ValueError(
                    f"no published generation under {root!r} — run "
                    "init_ann_index before streaming appends (ingest "
                    "assignment needs centroids)"
                )
            cents = (
                spark.read.parquet(f"{gen}/centroids")
                .select(
                    F.col("label").cast("int").alias("cluster"),
                    F.col("centroid").alias("c"),
                )
            )
            dim = len(cents.select("c").head()["c"])
            assigned = kmeans_assign(ev, cents, dim=dim)
            ev = ev.join(assigned, "vec_id").select(
                "vec_id", "v", F.col("cluster").alias("label")
            )
        (
            ev.write.mode("overwrite")
            .parquet(f"{_seg_dir(root)}/segment={batch_id}")
        )

    return (
        vec_stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_live_vectors(spark: SparkSession, root: str) -> DataFrame:
    """The full live corpus — every segment of the vector log — as the
    canonical (vec_id, v, label) relation. Compaction input; also the
    fresh-rebuild reference the lifecycle tests compare against."""
    return spark.read.parquet(_seg_dir(root)).select("vec_id", "v", "label")


def _gen_hwm(spark: SparkSession, gen_dir: str) -> int:
    return int(spark.read.parquet(f"{gen_dir}/_hwm").head()["hwm"])


def ann_search_live(
    spark: SparkSession,
    root: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """IVF top-k over the LIVE view: the published generation's vectors
    (label-partition-pruned to the probed clusters) UNION the log
    segments newer than the generation's high-water mark, filtered to
    the probed labels. Probing ranks the CURRENT generation's centroids
    — trained at the last compaction, i.e. deliberately stale for
    post-compaction arrivals; SCALE.md r11 measures what that staleness
    costs (on stationary data: nothing measurable) and compaction
    retrains it away. The unfolded tail is scanned as a filter (no
    label partitioning until folded) — the freshness/pruning trade every
    log-structured index makes."""
    gen = current_generation(root, spark=spark)
    if gen is None:
        raise ValueError(
            f"no published generation under {root!r} — run init_ann_index "
            "(readers need centroids to probe with)"
        )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cents = spark.read.parquet(f"{gen}/centroids")
    probes = [
        r.label
        for r in cents.select(
            "label", cosine_expr(F.col("centroid"), q).alias("ccos")
        )
        .orderBy(F.col("ccos").desc(), F.col("label"))
        .limit(n_probe)
        .collect()
    ]
    hwm = _gen_hwm(spark, gen)
    base = (
        spark.read.parquet(f"{gen}/vectors")
        .filter(F.col("label").isin(probes))
        .select("vec_id", "v", "label")
    )
    tail = (
        spark.read.parquet(_seg_dir(root))
        .filter((F.col("segment") > hwm) & F.col("label").isin(probes))
        .select("vec_id", "v", "label")
    )
    return (
        base.unionByName(tail)
        .select(
            "vec_id", F.round(cosine_expr(F.col("v"), q), 6).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def _next_gen_dir(spark: SparkSession, root: str) -> str:
    """Next generation directory: N = 1 + max over BOTH the published
    pointer and every existing ``gen-*`` directory under the root (r12,
    ADVICE r11 — deriving N from the pointer alone let two unpublished
    compactions target the same gen-N directory, the second silently
    overwriting the first's output; the directory listing is the same
    monotone gen-N sequence _gen_recency_key orders GC by)."""
    import os
    import re

    from sparkfulltextquery_spark.functions.index_stream import (
        _hadoop_fs,
        _local_pointer_path,
    )

    n = 0
    cur = current_generation(root, spark=spark)
    if cur is not None:
        m = re.search(r"gen-(\d+)$", cur)
        if m:
            n = int(m.group(1))
    rootp = _local_pointer_path(root)
    if rootp is not None:
        try:
            names = os.listdir(rootp)
        except FileNotFoundError:
            names = []
    else:
        _jvm, fs, p = _hadoop_fs(spark, root)
        names = (
            [st.getPath().getName() for st in fs.listStatus(p)]
            if fs.exists(p)
            else []
        )
    for nm in names:
        m = re.fullmatch(r"gen-(\d+)", nm)
        if m:
            n = max(n, int(m.group(1)))
    return f"{root}/gen-{n + 1}"


def compact_ann_index(
    spark: SparkSession,
    root: str,
    publish: bool = False,
    recluster_k: int | None = None,
    kmeans_iters: int = 4,
    train_sample_size: int | None = None,
    sample_seed: int = 11,
) -> str:
    """Fold the vector log into a fresh generation: build_ann_index over
    ALL live vectors — re-deriving centroids from the grown corpus and
    restoring label partitioning — stamped with the high-water segment id
    it folded, written to the next gen-N directory (never in place). The
    swap is the separate atomic step (publish_generation; pass
    publish=True to do both), so a compaction killed at any point leaves
    readers on the previous complete generation — the index_stream
    crash-safety contract, inherited.

    Default compaction keeps the ingest-time assignments and recomputes
    centroids as per-label means — exact fresh-rebuild parity with the
    live log, and the right call on STATIONARY corpora (measured: recall
    1.0 before and after at 10× growth). Under DISTRIBUTION SHIFT it is
    NOT enough: vectors from unseen neighborhoods were scattered across
    the old labels at ingest, frozen assignments keep them scattered, and
    per-label means barely move (measured, 2k base + 18k appends from 5
    unseen clusters: live recall@10 0.77 at n_probe=3, still 0.74 after a
    means-only compaction). ``recluster_k`` runs Lloyd k-means instead
    (kmeans_iterate — broadcast-centroid assign + O(k·dim) update
    shuffles per round) and assigns labels from scratch, which is what
    actually re-carves the space (same measure: 1.00 at n_probe≥2 with
    k=15). Size it to the believed cluster count; the SCALE.md r11/r12
    tables carry the measured trade.

    SAMPLE-TRAINED retrain (r12, VERDICT r11 #2): the full-corpus Lloyd
    loop costs kmeans_iters× full scans — at 100 TB that is the
    compaction bill. By default the trainer instead runs over a bounded
    DETERMINISTIC sample of ~1000·k vectors (content-addressed:
    xxhash64(vec_id, sample_seed) % 10⁶ under the target fraction, so
    the sample is layout- and partitioning-independent and reproducible
    from (corpus, seed) alone), derives centroids from the sample's
    final assignment, and pays ONE full-corpus nearest-centroid assign —
    the standard sample-train recipe, measured at recall parity with the
    full retrain on the drift fixture (tests/test_index.py) and in the
    SCALE.md r12 compaction-wall table. Pass ``train_sample_size=0`` to
    force the full-corpus Lloyd loop, or a positive row target to size
    the sample explicitly; corpora at or under the target train on
    everything (the sample IS the corpus, so the dial is purely cost)."""
    live = spark.read.parquet(_seg_dir(root))
    hwm_row = live.agg(F.max("segment").alias("hwm")).head()
    hwm = int(hwm_row["hwm"])
    gen_dir = _next_gen_dir(spark, root)
    vecs = live.select("vec_id", "v", "label")
    if recluster_k is not None:
        from sparkfulltextquery_spark.similarity import (
            kmeans_assign,
            kmeans_iterate,
        )

        target = (
            1000 * recluster_k
            if train_sample_size is None
            else train_sample_size
        )
        train = vecs
        sampled = False
        if target:
            n_live = vecs.count()
            if n_live > target:
                denom = 1_000_000
                # clamp the expected sample at ≥50·k rows so Lloyd always
                # has enough seeds even under an aggressive explicit target
                num = max(
                    int(denom * target / n_live),
                    -(-denom * 50 * recluster_k // n_live),
                )
                train = vecs.filter(
                    F.pmod(
                        F.xxhash64(F.col("vec_id"), F.lit(sample_seed)),
                        F.lit(denom),
                    )
                    < num
                )
                sampled = True
        assigned_t = kmeans_iterate(
            train,
            k=recluster_k,
            iters=kmeans_iters,
            id_col="vec_id",
            vec_col="v",
            truncate_lineage=True,
        )
        if sampled:
            # centroids from the trained sample's final assignment
            # (k·dim-bounded agg, localCheckpointed to a flat k-row
            # relation), then ONE full-corpus nearest-centroid assign
            dim = len(vecs.select("v").head()["v"])
            aggs = [
                F.avg(F.element_at(F.col("v"), i + 1)).alias(f"_m{i}")
                for i in range(dim)
            ]
            cents = (
                train.select("vec_id", "v")
                .join(assigned_t, "vec_id")
                .groupBy("cluster")
                .agg(*aggs)
                .select(
                    "cluster",
                    F.array(
                        *[F.col(f"_m{i}") for i in range(dim)]
                    ).alias("c"),
                )
                .localCheckpoint(eager=True)
            )
            assigned = kmeans_assign(
                vecs.select("vec_id", "v"), cents, vec_col="v", dim=dim
            )
        else:
            assigned = assigned_t
        vecs = vecs.drop("label").join(assigned, "vec_id").select(
            "vec_id", "v", F.col("cluster").alias("label")
        )
    build_ann_index(
        vecs,
        gen_dir,
        id_col="vec_id",
        vec_col="v",
        label_col="label",
    )
    spark.createDataFrame([(hwm,)], "hwm long").write.mode(
        "overwrite"
    ).parquet(f"{gen_dir}/_hwm")
    if publish:
        publish_generation(root, gen_dir, spark=spark)
    return gen_dir
