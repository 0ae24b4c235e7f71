"""Shared fixtures: one SparkSession per test session + the DuckDB oracle
harness mirroring the driver's correctness gate (row-count + column set +
order-insensitive value comparison)."""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path

import duckdb
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from sparkfulltextquery_spark import get_spark

    s = get_spark(app_name="sftq-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        # quantize so engine round-off in the last ulps doesn't fail equality
        return round(f, 6)
    if isinstance(v, Decimal):
        return round(float(v), 6)
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v
    return v


def norm_rows(pdf):
    """Sort columns by name, normalize cells, return sorted row tuples."""
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(r[c]) for c in cols)
        for _, r in pdf[cols].iterrows()
    ]
    return cols, sorted(rows, key=repr)


def assert_query_matches_oracle(spark, duck, fn, oracle_sql, name=""):
    sdf = fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    duck_pdf = duck.execute(oracle_sql).fetchdf()

    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    s_cols, s_rows = norm_rows(spark_pdf)
    d_cols, d_rows = norm_rows(duck_pdf)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != oracle {d_cols}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(s_rows)} row mismatches; first 3: "
        + "\n".join(f"spark={a}\noracle={b}" for _, a, b in mismatches[:3])
    )
