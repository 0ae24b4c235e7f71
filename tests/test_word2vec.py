"""Word2Vec training analogue (reference Word2Vec.scala:121, findSynonyms
:205): planted-synonym recovery and the registered query's shape."""

from __future__ import annotations

import pytest

from sparkfulltextquery_spark.similarity.word2vec import find_synonyms, train_word2vec


@pytest.fixture(scope="module")
def planted_vectors(spark):
    # "cat" and "feline" appear in identical contexts; "rock" never does.
    # Strongly structured corpus so skip-gram recovers the pair reliably.
    ctx = [
        ("the {} sat on the mat and purred loudly",),
        ("a small {} chased the toy across the floor",),
        ("my {} sleeps near the warm window every day",),
        ("the {} drank milk from the bowl at night",),
    ]
    rows = []
    for i in range(40):
        pat = ctx[i % len(ctx)][0]
        rows.append((pat.format("cat"),))
        rows.append((pat.format("feline"),))
        rows.append(("the rock lay still under cold deep water near the shore",))
    docs = spark.createDataFrame(rows, ["text"])
    return train_word2vec(
        docs, vector_size=16, min_count=5, max_iter=10, seed=7
    ).cache()


def test_vectors_schema_is_engine_embedding_shape(planted_vectors):
    assert planted_vectors.schema["vector"].dataType.simpleString() == "array<float>"
    vocab = {r.word for r in planted_vectors.select("word").collect()}
    assert {"cat", "feline", "rock"} <= vocab


def test_find_synonyms_recovers_planted_pair(planted_vectors):
    top = find_synonyms(planted_vectors, "cat", k=3).collect()
    words = [r.word for r in top]
    assert "feline" in words, words
    # the planted synonym must beat the unrelated distractor
    sim = {r.word: r.similarity for r in find_synonyms(planted_vectors, "cat", k=50).collect()}
    assert sim["feline"] > sim.get("rock", -1.0), sim


def test_registered_query_shape(spark):
    from sparkfulltextquery_spark.registry import REGISTRY
    from tests.conftest import SF_DIR

    df = REGISTRY["word2vec_synonyms"].fn(spark, SF_DIR)
    rows = df.collect()
    # invariant projection (driver-checkable): k results, query word
    # excluded, cosines in unit range — all must hold
    assert len(rows) == 1
    assert [f.name for f in df.schema.fields] == [
        "n_synonyms",
        "excludes_query_word",
        "sims_in_unit_range",
    ]
    assert tuple(rows[0]) == (5, True, True)
