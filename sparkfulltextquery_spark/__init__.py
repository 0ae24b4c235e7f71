"""sparkfulltextquery_spark — a PySpark-native analytics + full-text query engine.

A brand-new engine with the query and data-processing capabilities of
``bigdata-iscas/SparkFullTextQuery`` (a full-text-search fork of Apache Spark
2.1.0-SNAPSHOT), re-expressed Spark-first: the relational surface is the
modern DataFrame/SQL API planned by Catalyst, and the full-text layer
(tokenize → posting lists → TF-IDF/BM25 → top-k search) plus the large-scale
training-data operators (dedup, similarity search, text analysis, multimodal
columns) are thin, shuffle-parallel libraries of DataFrame transformations.

Layout
------
- ``session``    : SparkSession bootstrap tuned for the target cluster
- ``sources``    : table loaders / writers (parquet, csv, json, text, jdbc)
- ``operators``  : relational query builders (joins, aggs, windows, set ops)
- ``functions``  : full-text + text-analysis column functions
- ``plans``      : query-plan inspection helpers (explain / pushdown checks)
- ``streaming``  : Structured Streaming operators (windows, watermark, dedup)

Reference parity notes cite files under /root/reference (Spark 2.1 fork);
see SURVEY.md for the complete operator inventory this package covers.
"""

__version__ = "0.1.0"

from sparkfulltextquery_spark.session import get_spark  # noqa: F401

# ---------------------------------------------------------------------------
# Pinned public API (r9, VERDICT r08 #2). Everything listed here is the
# supported surface: `from sparkfulltextquery_spark import build_index, ...`.
# Resolution is lazy (PEP 562) so `import sparkfulltextquery_spark` stays
# cheap — submodules load on first attribute access, and the 386-row query
# registry only materializes when a registry-backed module is touched.
# ---------------------------------------------------------------------------

_PUBLIC_API = {
    # session / table IO
    "load_table": "sparkfulltextquery_spark.sources.tables",
    "load_tables": "sparkfulltextquery_spark.sources.tables",
    # persisted inverted index: build + search surface
    "build_index": "sparkfulltextquery_spark.functions.index",
    "refresh_index_caches": "sparkfulltextquery_spark.functions.index",
    "search_indexed": "sparkfulltextquery_spark.functions.index",
    "bm25_search_indexed": "sparkfulltextquery_spark.functions.index",
    "bm25f_search_indexed": "sparkfulltextquery_spark.functions.index",
    "dismax_search_indexed": "sparkfulltextquery_spark.functions.index",
    "simple_search_indexed": "sparkfulltextquery_spark.functions.index",
    "more_like_this_indexed": "sparkfulltextquery_spark.functions.index",
    "suggest_terms": "sparkfulltextquery_spark.functions.index",
    "resolve_expansions": "sparkfulltextquery_spark.functions.index_expand",
    "MAX_EXPANSIONS": "sparkfulltextquery_spark.functions.index_expand",
    # streaming index lifecycle (segments → compaction → generations → GC)
    "stream_update_postings": "sparkfulltextquery_spark.functions.index_stream",
    "stream_delete_docs": "sparkfulltextquery_spark.functions.index_stream",
    "read_live_postings": "sparkfulltextquery_spark.functions.index_stream",
    "compact_posting_segments": "sparkfulltextquery_spark.functions.index_stream",
    "publish_generation": "sparkfulltextquery_spark.functions.index_stream",
    "current_generation": "sparkfulltextquery_spark.functions.index_stream",
    "read_current_postings": "sparkfulltextquery_spark.functions.index_stream",
    "gc_generations": "sparkfulltextquery_spark.functions.index_stream",
    # boolean query language (inline, corpus-direct)
    "parse_query": "sparkfulltextquery_spark.functions.querylang",
    "search": "sparkfulltextquery_spark.functions.querylang",
    "simple_search": "sparkfulltextquery_spark.functions.querylang",
    # percolation / reverse search
    "percolate_matches": "sparkfulltextquery_spark.functions.percolate",
    "percolate_scored": "sparkfulltextquery_spark.functions.percolate",
    "register_percolator_queries": "sparkfulltextquery_spark.functions.percolate",
    "add_percolator_queries": "sparkfulltextquery_spark.functions.percolate",
    "remove_percolator_queries": "sparkfulltextquery_spark.functions.percolate",
    "percolate_from_table": "sparkfulltextquery_spark.functions.percolate",
    "stream_percolate_scored": "sparkfulltextquery_spark.functions.percolate",
    "stream_percolate_alerts": "sparkfulltextquery_spark.functions.percolate",
    "read_scored_alerts": "sparkfulltextquery_spark.functions.percolate",
    "MAX_COMPILE_QUERIES": "sparkfulltextquery_spark.functions.percolate",
    # deduplication
    "minhash_signatures": "sparkfulltextquery_spark.dedup.minhash",
    "lsh_candidate_pairs": "sparkfulltextquery_spark.dedup.minhash",
    "verified_near_dups": "sparkfulltextquery_spark.dedup.minhash",
    "connected_components": "sparkfulltextquery_spark.dedup.components",
    # similarity / ANN
    "cosine_topk": "sparkfulltextquery_spark.similarity",
    "ivf_topk": "sparkfulltextquery_spark.similarity",
    "build_ann_index": "sparkfulltextquery_spark.similarity",
    "ann_search_indexed": "sparkfulltextquery_spark.similarity",
    "pq_codebook": "sparkfulltextquery_spark.similarity",
    "pq_train": "sparkfulltextquery_spark.similarity",
    "pq_encode": "sparkfulltextquery_spark.similarity",
    "pq_adc_topk": "sparkfulltextquery_spark.similarity",
    "pq_adc_topk_from_codes": "sparkfulltextquery_spark.similarity",
    "ivfpq_topk": "sparkfulltextquery_spark.similarity",
    "kmeans_iterate": "sparkfulltextquery_spark.similarity",
    "auto_pq_config": "sparkfulltextquery_spark.similarity",
    # ANN index lifecycle (streaming ingest -> compaction -> swap, r11)
    "init_ann_index": "sparkfulltextquery_spark.similarity.lifecycle",
    "stream_append_vectors": "sparkfulltextquery_spark.similarity.lifecycle",
    "ann_search_live": "sparkfulltextquery_spark.similarity.lifecycle",
    "compact_ann_index": "sparkfulltextquery_spark.similarity.lifecycle",
    "read_live_vectors": "sparkfulltextquery_spark.similarity.lifecycle",
    # registered query catalog (the driver/bench surface)
    "query": "sparkfulltextquery_spark.registry",
}

__all__ = sorted(["__version__", "get_spark", *_PUBLIC_API])


def __getattr__(name: str):
    target = _PUBLIC_API.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(target), name)


def __dir__():
    return sorted(set(globals()) | set(__all__))
