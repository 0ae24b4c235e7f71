"""Driver-mirror correctness gate: every registered query with an oracle is
run on Spark and DuckDB at sf0.001 and compared order-insensitively —
the same check the driver applies at sf0.01 (CORRECTNESS_r{N}.json).

Queries without an oracle get a rows-smoke check (runs, stable schema).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from sparkfulltextquery_spark.registry import REGISTRY
from tests.conftest import SF_DIR, assert_query_matches_oracle

_WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle)
_ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if not s.oracle)


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    spec = REGISTRY[name]
    assert_query_matches_oracle(spark, duck, spec.fn, spec.oracle, name=name)


@pytest.mark.heavy
def test_no_query_degenerates_to_empty(spark):
    """An empty result passes the oracle comparison vacuously — make sure
    every registered query actually exercises rows at the test scale."""
    for name in _WITH_ORACLE + _ROWS_ONLY:
        df = REGISTRY[name].fn(spark, SF_DIR)
        assert df.limit(1).count() == 1, f"{name} returned no rows at {SF_DIR}"


def test_every_query_has_an_oracle():
    """The driver contract has no rows-only mode — an oracle-less query sits
    red whenever sampled. Nondeterministic operators emit their published
    CONTRACTS as deterministic invariant columns instead; keep it that way."""
    assert _ROWS_ONLY == [], _ROWS_ONLY


@pytest.mark.heavy
def test_all_query_schemas_deterministic(spark):
    """Two plan-builds of every registered query must yield identical
    schemas (the driver's stable-schema smoke, applied to all 200+):
    catches accidental nondeterminism in column naming/order/type."""
    for name in _WITH_ORACLE + _ROWS_ONLY:
        fn = REGISTRY[name].fn
        s1 = fn(spark, SF_DIR).schema
        s2 = fn(spark, SF_DIR).schema
        assert s1 == s2, f"{name}: schema changed between invocations"
