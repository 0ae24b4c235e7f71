"""Percolator registry boundary (VERDICT r08 #1): the per-query
flag-column compile was documented safe "up to O(10^3) stored queries"
but never exercised past 5. These tests compile a 1,000-query registry,
pin plan-build time, and prove the chunked overflow path (column-width-
bounded groups, results unioned) is exactly equivalent to both the
single-compile form and a pure-Python reference evaluator."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from scripts.measure_percolator_boundary import gen_registry
from tests.conftest import SF_DIR


def _py_matches(queries, toks):
    """Reference: {(query_id, doc_id)} via a pure-Python evaluator over
    per-doc token lists (term/AND/OR/NOT shapes — all gen_registry
    emits)."""
    from sparkfulltextquery_spark.functions import querylang as QL

    def ev(node, ts):
        if isinstance(node, QL.Term):
            return node.text in ts
        if isinstance(node, QL.Not):
            return not ev(node.child, ts)
        if isinstance(node, QL.And):
            return all(ev(c, ts) for c in node.children)
        return any(ev(c, ts) for c in node.children)

    out = set()
    for qid, q in queries:
        ast = QL.parse_query(q)
        for doc_id, ts in toks.items():
            if ev(ast, ts):
                out.add((qid, doc_id))
    return out


def _toks(spark):
    from sparkfulltextquery_spark.functions.fulltext import _py_tokenize
    from sparkfulltextquery_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    return {int(r.doc_id): _py_tokenize(r.text) for r in docs.collect()}


def _vocab_by_freq(toks, n=200):
    from collections import Counter

    c = Counter(t for ts in toks.values() for t in set(ts))
    return [t for t, _n in c.most_common(n)]


def test_percolator_1k_registry_chunked_equals_reference(spark):
    """1,000 stored boolean queries percolate correctly through the
    chunked production path (default MAX_COMPILE_QUERIES groups over the
    same posting relation), matching the pure-Python reference on every
    (query_id, doc_id) pair — and plan build stays bounded (the measured
    sf0.1 knee lives in SCALE.md; this pin is the regression tripwire,
    generous enough for a loaded CI host)."""
    from sparkfulltextquery_spark.functions import fulltext as FT
    from sparkfulltextquery_spark.functions.percolate import percolate_matches
    from sparkfulltextquery_spark.sources import load_table

    toks = _toks(spark)
    registry = gen_registry(_vocab_by_freq(toks), 1000)

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    rel = FT.positional_postings(docs).select("doc_id", "term", "positions")

    t0 = time.perf_counter()
    df = percolate_matches(rel, registry)
    df.schema  # force Catalyst analysis of every chunk
    compile_s = time.perf_counter() - t0
    got = {(int(r.query_id), int(r.doc_id)) for r in df.collect()}
    want = _py_matches(registry, toks)
    assert got == want
    assert want, "generated registry matched nothing — vocabulary drifted"
    assert compile_s < 120, f"1k-registry plan build took {compile_s:.1f}s"


def test_percolator_chunked_equals_single_compile(spark):
    """Chunk-boundary exactness: the same 300-query registry percolated
    as one compile, as 50-query chunks, and as 7-query (ragged tail)
    chunks produces identical (query_id, doc_id) sets — chunking is a
    pure plan-width decision, never a semantics change. Summary and
    scored forms chunk identically (per-query aggregation/top-k carries
    no cross-query state)."""
    from sparkfulltextquery_spark.functions import fulltext as FT
    from sparkfulltextquery_spark.functions.percolate import (
        _percolate_bool,
        percolate_matches,
    )
    from sparkfulltextquery_spark.sources import load_table

    toks = _toks(spark)
    registry = gen_registry(_vocab_by_freq(toks), 300)

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    rel = FT.positional_postings(docs).select("doc_id", "term", "positions")

    single = {
        (int(r.query_id), int(r.doc_id))
        for r in percolate_matches(rel, registry, chunk_size=10**9).collect()
    }
    for cs in (50, 7):
        chunked = {
            (int(r.query_id), int(r.doc_id))
            for r in percolate_matches(rel, registry, chunk_size=cs).collect()
        }
        assert chunked == single, f"chunk_size={cs} diverged"

    sum_single = {
        tuple(r)
        for r in _percolate_bool(rel, registry, chunk_size=10**9).collect()
    }
    sum_chunked = {
        tuple(r) for r in _percolate_bool(rel, registry, chunk_size=50).collect()
    }
    assert sum_chunked == sum_single


def test_percolator_chunking_catches_cross_chunk_duplicate_ids(spark):
    """The registry-wide duplicate-id gate fires even when the duplicates
    would land in DIFFERENT chunks (the per-compile check alone would
    miss them and silently union both)."""
    import pytest

    from sparkfulltextquery_spark.functions.percolate import percolate_matches

    rel = spark.createDataFrame(
        [(1, "spark", [0])], "doc_id long, term string, positions array<int>"
    )
    dup = [(i, "spark") for i in range(1, 5)] + [(1, "join")]
    with pytest.raises(ValueError, match="duplicate stored percolator"):
        percolate_matches(rel, dup, chunk_size=2)


def test_percolator_scored_chunked_equals_single(spark):
    """Ranked percolation chunks exactly: per-query BM25 top-k is
    independent across queries, so the chunked union equals the single
    compile row-for-row (same scores, same k cut)."""
    from sparkfulltextquery_spark.functions import fulltext as FT
    from sparkfulltextquery_spark.functions import querylang as QL
    from sparkfulltextquery_spark.functions.fulltext import doc_lengths
    from sparkfulltextquery_spark.functions.percolate import percolate_scored
    from sparkfulltextquery_spark.sources import load_table

    toks = _toks(spark)
    registry = gen_registry(_vocab_by_freq(toks), 40)

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    rel = (
        FT.positional_postings(docs)
        .join(doc_lengths(docs), "doc_id")
        .select("doc_id", "term", "positions", "tf", "dl")
    )
    union_pos = sorted(
        {t for _qid, q in registry for t in QL.positive_terms(QL.parse_query(q))}
    )
    dls = doc_lengths(docs)
    st = dls.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")).head()
    dfr = {
        r.term: int(r.df)
        for r in FT.postings(docs)
        .filter(F.col("term").isin(union_pos))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    df_of = {t: dfr.get(t, 0) for t in union_pos}

    def run(cs):
        return sorted(
            (int(r.query_id), int(r.doc_id), float(r.score))
            for r in percolate_scored(
                rel, registry, int(st.n), float(st.avgdl), df_of, k=3,
                chunk_size=cs,
            ).collect()
        )

    assert run(9) == run(10**9)
