"""Boolean query-language unit tests: parser shape, error handling, and
retrieval semantics vs straightforward set algebra over collected token sets."""

from __future__ import annotations

import re

import pytest

from sparkfulltextquery_spark.functions.querylang import (
    And,
    Not,
    Or,
    Phrase,
    Term,
    parse_query,
    search,
)
from sparkfulltextquery_spark.sources import load_table
from tests.conftest import SF_DIR


def test_parser_precedence_and_shapes():
    assert parse_query("spark") == Term("spark")
    assert parse_query('"batch batch"') == Phrase("batch batch")
    assert parse_query("spark AND join") == And((Term("spark"), Term("join")))
    assert parse_query("spark join") == And((Term("spark"), Term("join")))  # implicit AND
    # AND binds tighter than OR
    assert parse_query("a AND b OR c") == Or((And((Term("a"), Term("b"))), Term("c")))
    assert parse_query("a OR b AND c") == Or((Term("a"), And((Term("b"), Term("c")))))
    assert parse_query("NOT vector") == Not(Term("vector"))
    assert parse_query("(a OR b) AND c") == And((Or((Term("a"), Term("b"))), Term("c")))
    assert parse_query("Spark AND JOIN") == And((Term("spark"), Term("join")))  # normalized


@pytest.mark.parametrize(
    "bad", ["", "AND spark", "spark AND", "(spark", "spark)", '""', "spark OR"]
)
def test_parser_rejects_malformed(bad):
    with pytest.raises(ValueError):
        parse_query(bad)


def _token_sets(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    toks = {
        r.doc_id: [t for t in re.split("[^a-z0-9]+", r.text.lower()) if t] for r in docs
    }
    return toks


def test_search_semantics_match_set_algebra(spark):
    toks = _token_sets(spark)
    has = lambda t: {d for d, ts in toks.items() if t in ts}
    phrase = {
        d
        for d, ts in toks.items()
        if any(ts[i] == "batch" and ts[i + 1] == "batch" for i in range(len(ts) - 1))
    }
    expected = (has("spark") & has("join")) | (phrase - has("vector"))

    got = {
        r.doc_id
        for r in search(
            load_table(spark, SF_DIR, "documents"),
            '(spark AND join) OR ("batch batch" AND NOT vector)',
            k=1_000_000,
        ).collect()
    }
    assert got == expected


def test_pure_negation_query(spark):
    toks = _token_sets(spark)
    expected = {d for d, ts in toks.items() if "spark" not in ts}
    got = {
        r.doc_id
        for r in search(
            load_table(spark, SF_DIR, "documents"), "NOT spark", k=1_000_000
        ).collect()
    }
    assert got == expected


def test_flag_compilation_equals_join_compilation(spark):
    """compile_matches_flags (r04 one-pass boolean eval) must produce the
    same doc set as the join-based compile_matches for every satisfiable
    AST shape, and decline (None) exactly the pure-negation shapes."""
    from sparkfulltextquery_spark.functions.fulltext import phrase_match, postings
    from sparkfulltextquery_spark.functions.querylang import (
        compile_matches,
        compile_matches_flags,
        parse_query,
    )

    docs = load_table(spark, SF_DIR, "documents")
    post = postings(docs)
    phrase_fn = lambda text: phrase_match(docs, text).select("doc_id")  # noqa: E731
    universe = docs.select("doc_id")

    satisfiable = [
        "spark",
        "spark AND join",
        "spark OR join",
        "spark AND NOT join",
        '(spark AND join) OR ("batch batch" AND NOT vector)',
        "(spark OR join) AND (vector OR NOT batch)",
        '"batch batch"',
        'NOT vector AND "batch batch"',
    ]
    for q in satisfiable:
        ast = parse_query(q)
        flags = compile_matches_flags(ast, post, phrase_fn)
        assert flags is not None, q
        want = {
            r.doc_id
            for r in compile_matches(ast, post, phrase_fn, universe).collect()
        }
        got = {r.doc_id for r in flags.collect()}
        assert got == want, q

    for q in ["NOT spark", "NOT (spark AND join)", "NOT spark OR join"]:
        assert compile_matches_flags(parse_query(q), post, phrase_fn) is None, q
